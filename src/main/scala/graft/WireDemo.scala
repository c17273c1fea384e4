package graft

/** Demo main: the full client/server wire story end to end — start a
  * [[graft.wire.GraftWireServer]] on a loopback port, then drive it with
  * [[graft.wire.GraftWireClient]] exactly the way the reference's
  * `AsyncQueryClient` would (submit → poll → page forward via the
  * iterator's offset arithmetic → clean ReachedEndOfFiles), printing
  * what travelled. A user of the reference pointing their client at this
  * port gets the same envelopes.
  *
  *   sbt "runMain graft.WireDemo /root/testdata/sf0.001"
  */
object WireDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sql = if (args.length > 1) args(1)
      else s"select o_orderkey, o_totalprice " +
        s"from read_files('$sfDir/orders.parquet') " +
        "where o_totalprice > 300000.0 order by o_orderkey"
    val spark = graft.engine.GraftSession.getOrCreate("graft-wire-demo")
    val root = java.nio.file.Files.createTempDirectory("wire_results")
    val runner = new graft.exec.AsyncQueryRunner(spark, root.toString)
    val server = new graft.wire.GraftWireServer(runner).start()
    println(s"[wire] serving on 127.0.0.1:${server.port} " +
      s"(worker ${server.workerId.toString(16).take(12)}…)")
    try {
      val client = new graft.wire.GraftWireClient(server.port)
      val qid = client.runQuery(sql).getOrElse(
        sys.error("RunQueryResp::NotCreated"))
      println(s"[wire] RunQueryResp::Created query_id=$qid")
      val fin = client.waitForFinish(qid, maxWaitMs = 120000L)
      println(s"[wire] GetQueryStatusResp::Status($fin)")
      var cursor: Option[graft.exec.CursorPager.Cursor] =
        Some(graft.exec.CursorPager.Start)
      var pages = 0
      var rows = 0L
      while (cursor.isDefined) {
        client.getQueryData(qid, cursor.get, 500, forward = true,
          allowOverflow = false) match {
          case r: graft.wire.GraftWireClient.DataRecord =>
            pages += 1
            rows += r.rows.length
            if (pages == 1)
              println(s"[wire] first page: ${r.rows.length} rows, " +
                s"first_offset=${r.firstOffset}, head=${r.rows.head}")
            cursor = graft.wire.GraftWireClient.nextForward(r.offsets)
          case graft.wire.GraftWireClient.DataEndOfFiles =>
            println("[wire] GetQueryDataResp::ReachedEndOfFiles")
            cursor = None
          case other => sys.error(s"unexpected: $other")
        }
      }
      println(s"[wire] paged $rows rows over $pages Record responses")
      runner.forget(graft.wire.Wire.u128ToUuid(qid), deleteFiles = true)
    } finally {
      server.stop()
      spark.stop()
    }
  }
}
