package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.exec.{CursorPager, ResultMaterializer}
import graft.exec.CursorPager.{Cursor, Start}
import graft.sql.QueryFacade

/** Specs for the system surfaces kept from the reference: SQL facade
  * (statement splitting + read_files rewrite), result materialization
  * (rec_N.parquet layout), and bidirectional cursor paging.
  */
class ExecSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("splitStatements: semicolons in strings/comments don't split") {
    val s = QueryFacade.splitStatements(
      "select ';' as x; -- trailing; comment\nselect 2;\n\nselect \";\"")
    assert(s === Seq("select ';' as x", "-- trailing; comment\nselect 2",
      "select \";\""))
  }

  test("read_files rewrite runs the reference demo query end-to-end") {
    // the reference's own demo: select * from read_files(...) where ...
    val df = QueryFacade.run(spark,
      s"select * from read_files('$dir/lineitem.parquet') " +
        "where l_quantity > 45.0")
    assert(df.count() ===
      spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_quantity") > 45.0).count())
  }

  test("facade rejects multi-statement run()") {
    intercept[QueryFacade.MultipleStatements] {
      QueryFacade.run(spark, "select 1; select 2")
    }
    intercept[QueryFacade.EmptyQuery] { QueryFacade.run(spark, "  ;; ") }
  }

  test("materializer writes rec_N layout and reads footers") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .repartition(4)
    val rs = ResultMaterializer.materialize(df, tmp, "q-123")
    assert(rs.files.nonEmpty)
    assert(rs.files.forall(_.path.contains("rec_")))
    assert(rs.totalRows === 6000L)
    val reopened = ResultMaterializer.open(s"$tmp/q-123")
    assert(reopened.files.map(_.rowGroupRows) === rs.files.map(_.rowGroupRows))
  }

  test("cursor pager: forward pages reassemble the full result in order") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey").coalesce(2)
    val rs = ResultMaterializer.materialize(df, tmp, "q-fwd")
    val pager = new CursorPager(spark, rs)
    var cursor: Option[Cursor] = Some(Start)
    val got = Vector.newBuilder[Long]
    var pages = 0
    while (cursor.isDefined) {
      val p = pager.page(cursor.get, 137, forward = true)
      got ++= p.rows.map(_.getLong(0))
      assert(p.offsets.length === p.rows.length)
      cursor = p.next
      pages += 1
    }
    val all = got.result()
    assert(all.length === 1500)
    assert(pages === (1500 + 136) / 137)
    // global order = concatenation of the materialized files in rec order
    val direct = rs.files.flatMap(f =>
      spark.read.parquet(f.path).collect().map(_.getLong(0)))
    assert(all === direct)
  }

  test("cursor pager: backward then forward round-trips") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey").coalesce(3)
    val rs = ResultMaterializer.materialize(df, tmp, "q-rev")
    val pager = new CursorPager(spark, rs)
    // jump to the middle, page back, then forward from the returned cursor
    val mid = pager.toCursor(700L)
    val back = pager.page(mid, 100, forward = false)
    assert(back.rows.length === 100)
    assert(pager.toGlobal(back.next.get) === 600L)
    val fwd = pager.page(back.next.get, 100, forward = true)
    assert(fwd.rows.map(_.getLong(0)) === back.rows.map(_.getLong(0)))
    // boundary: backward from start is empty, partial page at the tail
    assert(pager.page(Start, 10, forward = false).rows.isEmpty)
    val tail = pager.page(pager.toCursor(1490L), 100, forward = true)
    assert(tail.rows.length === 10 && tail.next.isEmpty)
  }

  test("cursor round-trip: toCursor ∘ toGlobal = identity on all rows") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/supplier.parquet").coalesce(1)
    val rs = ResultMaterializer.materialize(df, tmp, "q-id")
    val pager = new CursorPager(spark, rs)
    (0L until pager.totalRows).foreach { g =>
      assert(pager.toGlobal(pager.toCursor(g)) === g)
    }
  }
}
