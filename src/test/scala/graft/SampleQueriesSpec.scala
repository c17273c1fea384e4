package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.QueryFacade

/** The reference's OWN shipped queries, run VERBATIM: every statement of
  * every `sample_queries` .sql file executes through QueryFacade with
  * only the `sample_data/` path prefix rewritten to a local build of the
  * same table shapes (create_sample_data.rs:157-210: `simple` = 100 rows
  * of (id int32 sequential, value1 utf8, value2 float32) across multiple
  * files, `simple_wide_string` = the same with ~1 KiB strings,
  * `large_simple` = 10 000 rows, `huge_simple` = 1 000 000 rows). This
  * is the literal "a user of the reference could switch" check — their
  * demo scripts run unchanged, including the coercion shapes its own
  * engine trips on (`id > 25 + 0.0`, `1.0 / id`, `(value2 + 10) / 100`)
  * and the ORDER BY its sort task never finishes (sort_task.rs:107).
  */
class SampleQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // deterministic analogs of the reference's random generators: id is
  // the same sequential int32; value1/value2 are seeded derivations so
  // expectations are computable, with the same types (utf8, float32)
  private def simpleFrame(n: Int, wide: Boolean) = {
    val v1 = if (wide) rpad(md5(col("id").cast("string")), 1024, "x")
      else substring(md5(col("id").cast("string")), 1, 8)
    spark.range(n.toLong).select(
      col("id").cast("int").as("id"),
      v1.as("value1"),
      ((col("id") * 37 % 1000) / 10.0).cast("float").as("value2"))
  }

  lazy val base: String = {
    val dir = java.nio.file.Files.createTempDirectory("sample_data").toString
    simpleFrame(100, wide = false).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/simple")
    simpleFrame(100, wide = true).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/simple_wide_string")
    simpleFrame(10000, wide = false).repartition(10)
      .write.mode("overwrite").parquet(s"$dir/large_simple")
    simpleFrame(1000000, wide = false).repartition(100)
      .write.mode("overwrite").parquet(s"$dir/huge_simple")
    dir
  }

  private def runFile(name: String) = {
    val sql = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"/root/reference/sample_queries/$name"))
      .replace("sample_data/", s"$base/")
    QueryFacade.runScript(spark, sql)
  }

  test("simple.sql: all five statements run; filters, projection, and " +
       "the reference's own coercion shapes are value-exact") {
    val dfs = runFile("simple.sql")
    assert(dfs.length === 5)
    assert(dfs(0).count() === 25) // id < 25
    assert(dfs(1).count() === 74) // wide strings, id > 25
    assert(dfs(1).head().getString(1).length === 1024)
    assert(dfs(2).count() === 75) // two-column projection, id < 75
    assert(dfs(2).columns.toSeq === Seq("id", "value2"))
    // query 4: the arithmetic the reference's compute_value interprets.
    // Spark parses `10.0`-style literals as DECIMAL (the documented
    // coercion delta, SURVEY §7.5), so numeric cells are read
    // type-tolerantly and compared against the direct computation
    def num(r: org.apache.spark.sql.Row, i: Int): Double = r.get(i) match {
      case d: java.math.BigDecimal => d.doubleValue()
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case n: Int => n.toDouble
      case other => fail(s"non-numeric cell $other")
    }
    val q4 = dfs(3).orderBy("id").collect()
    assert(q4.length === 74) // id > 25 + 0.0 (int vs double coercion)
    val src = simpleFrame(100, wide = false).filter(col("id") > 25)
      .orderBy("id").collect()
    q4.zip(src).foreach { case (got, s) =>
      val id = s.getInt(0); val v2 = s.getFloat(2)
      assert(got.getInt(0) === id)
      assert(num(got, 2) === id + 10.0, "id_plus_10")
      assert(math.abs(num(got, 3) - (v2 + 10.0) / 100.0) < 1e-6,
        "(value2 + 10) / 100")
      assert(math.abs(num(got, 4) - 1.0 / id) < 1e-9, "1.0 / id")
      assert(math.abs(num(got, 5) - 1.0 / (id.toLong * id)) < 1e-9,
        "1.0 / (id*id)")
      assert(got.getInt(6) === id * id, "id * id")
    }
    assert(dfs(4).count() === 50) // id % 2 = 0
  }

  test("simple_order_by.sql: the ORDER BY the reference never finishes " +
       "(sort_task.rs:107) emits, descending") {
    val dfs = runFile("simple_order_by.sql")
    assert(dfs.length === 1)
    val ids = dfs(0).collect().map(_.getInt(0)).toSeq
    assert(ids === (24 to 0 by -1))
  }

  test("large_simple.sql and huge_simple.sql: the same statements hold " +
       "at 10k and 1M rows") {
    assert(runFile("large_simple.sql").head.count() === 5000)
    assert(runFile("huge_simple.sql").head.count() === 500000)
  }

  test("edge_cast_query.sql, only_wide_strings_query.sql, " +
       "simple-error-case.sql: every remaining shipped script runs") {
    assert(runFile("edge_cast_query.sql").map(_.count()) === Seq(25L))
    assert(runFile("only_wide_strings_query.sql").head.count() === 74)
    // the file the reference names its ERROR case — all four statements
    // (including the one whose data "doesn't show") run clean here
    val err = runFile("simple-error-case.sql")
    assert(err.map(_.count()) === Seq(74L, 25L, 75L, 74L))
  }
}
