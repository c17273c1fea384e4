package graft

import graft.exec.{CursorPager, ResultMaterializer}
import graft.exec.CursorPager.Start
import graft.sql.QueryFacade

/** Demo/diagnostic main: the reference's full client lifecycle end-to-end —
  * submit SQL (with read_files), materialize the result as
  * `query_results/<id>/rec_N.parquet`, then cursor-page it back, forward
  * and backward. Usage: runMain graft.QueryDemo [sfDir] [sql]
  */
object QueryDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sql = if (args.length > 1) args(1)
      else s"select * from read_files('$sfDir/lineitem.parquet') " +
        "where l_quantity > 45.0 order by l_orderkey, l_linenumber"
    val spark = graft.engine.GraftSession.getOrCreate("graft-query-demo")
    val df = QueryFacade.run(spark, sql)
    val root = java.nio.file.Files
      .createTempDirectory("query_results").toString
    val qid = java.util.UUID.randomUUID().toString
    val rs = ResultMaterializer.materialize(df, root, qid)
    println(s"MATERIALIZED files=${rs.files.length} rows=${rs.totalRows} " +
      s"dir=$root/$qid")
    val pager = new CursorPager(spark, rs)
    var cursor: Option[CursorPager.Cursor] = Some(Start)
    var page = 0
    var rows = 0L
    while (cursor.isDefined) {
      val p = pager.page(cursor.get, 500, forward = true)
      rows += p.rows.length
      if (page == 0 && p.rows.nonEmpty)
        println(s"FIRST_ROW=${p.rows.head} AT=${p.offsets.head}")
      cursor = p.next
      page += 1
    }
    println(s"PAGED_FORWARD pages=$page rows=$rows")
    if (pager.totalRows > 0) {
      val tail = pager.page(pager.toCursor(pager.totalRows - 1), 500,
        forward = false)
      println(s"PAGED_BACK rows=${tail.rows.length} " +
        s"next=${tail.next.map(pager.toGlobal)}")
      // reverse page clamped at the start, topped up via allow_overflow
      val near = math.min(2L, pager.totalRows - 1)
      val ovf = pager.page(pager.toCursor(near), 10, forward = false,
        allowOverflow = true)
      println(s"OVERFLOW_PAGE rows=${ovf.rows.length}")
      // the wire format: one page as a self-describing Arrow IPC stream
      val arrow = pager.pageArrow(Start, 100)
      println(s"ARROW_PAGE bytes=${arrow.ipc.length} " +
        s"rows=${arrow.offsets.length}")
    }
    // the async lifecycle: submit -> poll -> page -> forget
    val runner = new graft.exec.AsyncQueryRunner(spark, root)
    val aid = runner.submit(sql)
    val fin = runner.waitForFinish(aid)
    println(s"ASYNC status=${fin.getClass.getSimpleName} " +
      s"rows=${runner.results(aid).totalRows}")
    runner.forget(aid, deleteFiles = true)
    // incremental: rec files commit while the query streams; compact after
    val incId = java.util.UUID.randomUUID().toString
    val incRs = ResultMaterializer.materializeIncremental(
      QueryFacade.run(spark, sql), root, incId, rowsPerFile = 100)
    val compacted = ResultMaterializer.compact(spark, s"$root/$incId",
      minRowsPerFile = 400L)
    println(s"INCREMENTAL files=${incRs.files.length} -> " +
      s"COMPACTED files=${compacted.files.length} rows=${compacted.totalRows}")
    spark.stop()
  }
}
