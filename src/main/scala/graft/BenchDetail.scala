package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: the per-query NOISE LEDGER the one-shot Bench can't
  * provide. Bench records min-of-reps (the right number to publish);
  * this main records EVERY rep — interleaved across full passes, same
  * discipline as Bench — and writes min/median/max per query, so a
  * cross-round drift call ("dedup_ngram went 1.04→2.38 s on untouched
  * code") can be settled against the measured spread instead of
  * re-litigated from two one-shot samples.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ONLY=q1,q2 \
  *     sbt "runMain graft.BenchDetail out.json"
  *
  * SPARK_GRAFT_REPS defaults to 5 here (vs Bench's 3): the ledger's
  * purpose is the spread, and 5 samples make the median meaningful.
  */
object BenchDetail {

  /** Semantic labels for queries whose rep timings do NOT mean "the
    * operator's cost": first-rep-vs-rest asymmetry that is CONTRACTUAL,
    * not cache noise. A ledger consumer reading the median without
    * these would misjudge the operator (the round-15 lesson:
    * dedup_stream_fold's 0.1 s median is the exactly-once redelivery
    * no-op; the real cold ingest is the first rep / SCALING.md).
    */
  val Notes: Map[String, String] = Map(
    "dedup_stream_fold" -> ("first rep = the COLD streaming ingest " +
      "fold (seed + micro-batches); later reps measure the " +
      "exactly-once contract's committed-store redelivery no-op " +
      "(one parquet read) — both are real semantics, report them " +
      "separately"),
    "dedup_incremental_minhash" -> ("first rep builds the persisted " +
      "band-index artifact (per-JVM memoized); later reps are the " +
      "steady-state delta probe — the production shape"),
    "ann_incremental" -> ("first rep builds the persisted IVF index " +
      "artifact (per-JVM memoized); later reps are the steady-state " +
      "delta probe — the production shape"))

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("target/bench_detail_reps.json")
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
    graft.functions.GraftFunctions.register(spark)
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(5)
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 0 until reps; (name, fn) <- selected) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[detail] $name FAILED: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def median(v: Vector[Double]): Double = {
      val s = v.sorted
      if (s.isEmpty) Double.NaN
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def f(d: Double): String = f"$d%.3f"
    val body = selected.map(_._1).filter(times(_).nonEmpty).map { n =>
      val v = times(n)
      val note = Notes.get(n)
        .map(t => s""","note":"${t.replace("\"", "'")}"""").getOrElse("")
      s""""$n":{"reps":[${v.map(f).mkString(",")}],"min":${f(v.min)},""" +
        s""""median":${f(median(v))},"max":${f(v.max)}$note}"""
    }.mkString("{", ",", "}")
    val json = s"""{"sf":"$sfDir","reps":$reps,"queries":$body}"""
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    println(s"[detail] wrote $outPath")
    spark.stop()
  }
}
