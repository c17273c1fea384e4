package graft

import org.apache.spark.sql.functions.desc
import graft.streaming.EventStreams

/** Demo/diagnostic main: drives the Structured Streaming surface end-to-end
  * (file source → watermark+window agg → memory sink; then the stateful
  * flatMapGroupsWithState sessionizer) against a staged copy of the events
  * table. Usage: runMain graft.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.engine.GraftSession.getOrCreate("graft-stream-demo")
    val tmp = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      tmp.resolve("part-00000.parquet"))

    val wq = EventStreams.windowedCounts(
        EventStreams.readEventStream(spark, tmp.toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("wc").start()
    wq.processAllAvailable()
    println(s"STREAM_WINDOW_ROWS=${spark.table("wc").count()}")
    spark.table("wc").orderBy(desc("n_events")).show(3, truncate = false)
    wq.stop()

    val sq = EventStreams.sessionizeStream(
        EventStreams.readEventStream(spark, tmp.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess").start()
    sq.processAllAvailable()
    println(s"SESSIONS_CLOSED=${spark.table("sess").count()}")
    sq.stop()

    // stream-stream interval join: purchases attributed to a prior view
    val jq = EventStreams.viewPurchaseJoin(
        EventStreams.readEventStream(spark, tmp.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("vp").start()
    jq.processAllAvailable()
    println(s"ATTRIBUTED_PAIRS=${spark.table("vp").count()}")
    jq.stop()

    // streaming dedup: replay the same file twice, expect unique ids once
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      tmp.resolve("replay.parquet"))
    val dq = EventStreams.dedupStream(
        EventStreams.readEventStream(spark, tmp.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    dq.processAllAvailable()
    println(s"DEDUP_UNIQUE=${spark.table("dedup").count()}")
    dq.stop()
    spark.stop()
  }
}
