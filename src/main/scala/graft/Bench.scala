package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR at local[N], prints ONE JSON line.
  *
  * Each query is forced through the `noop` datasource write — unlike
  * `.count()`, which lets Catalyst prune every column and skip the actual
  * work, noop evaluates the full result rows, so timings reflect real
  * operator cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT + shuffle-machinery warmup so per-query numbers measure the
    // queries, not first-use costs.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // diagnostics: SPARK_GRAFT_ONLY=q1,q2 restricts the run
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // best-of-N (default 2): one-shot timings on a shared machine carry
    // ±30% scheduler/GC noise; the minimum estimates the operator's cost.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            if (!failed.contains(name)) {
              failed += name
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            }
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // min over SUCCESSFUL reps — a fast failure must not report as the
      // query's time; an always-failing query keeps its (failed) timing
      val good = times.filter(_._2)
      name -> (if (good.nonEmpty) good.map(_._1).min else times.map(_._1).min)
    }
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // The driver keeps only the LAST 2000 chars of sbt output and parses
    // the JSON line out of that tail. Full-precision values for ~90
    // queries overflow it (rounds 1-3 all recorded "parsed": null), so
    // the printed line is compacted: centisecond precision, trailing
    // zeros stripped, sf as basename. Full nanosecond-precision timings
    // go to target/bench_detail.json for local analysis.
    val sfName = sfDir.split('/').last
    val line = renderLine(results, sfName, fj)
    val detail = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    try {
      val p = java.nio.file.Paths.get("target/bench_detail.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        s"""{"total":$total,"queries":$detail,"failed":$fj,"sf":"$sfDir"}"""
          .getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }

  /** Centisecond-precision JSON number with trailing zeros stripped
    * ("0.40"→"0.4", "1.00"→"1") — every byte of the printed line counts
    * against the driver's 2000-char output tail.
    */
  def fmt(v: Double): String = {
    val s = f"$v%.2f"
    if (!s.contains('.')) s
    else s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
  }

  /** The one JSON line Bench would print for the given per-query timings —
    * exposed so a spec can pin its length under the driver's tail budget.
    */
  def renderLine(results: Seq[(String, Double)], sfName: String,
                 failedJson: String = "[]"): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${fmt(results.map(_._2).sum)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfName"}"""
  }
}
