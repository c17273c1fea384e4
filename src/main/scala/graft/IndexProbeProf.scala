package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Diagnostic main: per-phase cost of one bucket-pruned band-index
  * probe against a corpus dir — the profiling companion to
  * StreamDedupBench (which times whole batches and can't say whether a
  * regression is the read, the banding, or the verdict join).
  *
  *   sbt "runMain graft.IndexProbeProf /tmp/graft_scale100"
  *
  * Prints: artifact build (memoized — 0 on a warm dir), batch banding,
  * pb collect, pruned read (files/rows/seconds) vs full read
  * (files/rows/seconds).
  */
object IndexProbeProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchRows = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Partitioning.autoTune(spark, dir)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val path = timed("artifact build/lookup") {
      Dedup.minhashIndexPath(spark, dir)
    }
    println(s"[probe-prof] buckets = ${Dedup.indexBuckets(path)}")
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val delta = docs.filter(
      col("doc_id") % Dedup.IndexDeltaMod === Dedup.IndexDeltaRem)
      .limit(batchRows)
    val bands = timed("batch banding (persist)") {
      val b = Dedup.minhashBands(spark, delta).persist()
      b.count()
      b
    }
    for (i <- 1 to 2) {
      val pruned = timed(s"pruned read #$i") {
        graft.exec.QueryMetrics.profile(
          Dedup.readBandIndexPruned(spark, path, bands))
      }
      println(s"[probe-prof]   pruned files=${pruned.filesRead} " +
        s"rows=${pruned.scanRows}")
      val full = timed(s"full read #$i") {
        graft.exec.QueryMetrics.profile(spark.read.parquet(path).drop("pb"))
      }
      println(s"[probe-prof]   full   files=${full.filesRead} " +
        s"rows=${full.scanRows}")
    }
    bands.unpersist()
    spark.stop()
  }
}
