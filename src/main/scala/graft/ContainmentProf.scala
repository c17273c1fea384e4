package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: stage-level timing of `dedup_containment` — the
  * fleet's heaviest measured point at the zipf ×100 corpus (49.3 s,
  * exponent 0.56 in SCALING.md r17). Times each tier in isolation so
  * the optimization lands where the seconds are, not where a guess
  * puts them: the gram profile (g), the df/prefix ranking (gd), the
  * prefix join (cand0), the count-signature gate (cand), and the full
  * query.
  *
  * Usage: runMain graft.ContainmentProf [sfDir]
  */
object ContainmentProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Partitioning.autoTune(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // BLOCKING sweep between legs: each containmentCandidates call
    // localCheckpoints a corpus-sized gram profile; leaving the prior
    // leg's blocks to an async release contaminated the next leg's
    // time (measured 50 -> 61 -> 153 s across identical-shape legs)
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    val maxDf = Dedup.containMaxDfFor(Dedup.docCount(spark, dir))
    println(s"[contain-prof] dir=$dir maxDf=$maxDf")
    // candidate tier WITHOUT the positional filter OR the signature
    // gate — the r17 shape, for the candidate-volume before/after
    val ((gP, candP), tCandP) = time {
      val p = Dedup.containmentCandidates(spark, dir,
        maxDf = maxDf, sigPrefilter = false, posFilter = false)
      (p._1, p._2.persist())
    }
    val (nCandP, tCountP) = time(candP.count())
    println(f"[contain-prof] cand- (no pos, no gate): $nCandP pairs, " +
      f"build ${tCandP}%.2f s + count ${tCountP}%.2f s")
    candP.unpersist(blocking = true)
    sweep()
    // candidate tier WITHOUT the signature gate (isolates the gate's
    // own cost vs what it saves the verify)
    val ((g0, cand0), tCand0) = time {
      val p = Dedup.containmentCandidates(spark, dir,
        maxDf = maxDf, sigPrefilter = false)
      (p._1, p._2.persist())
    }
    val (nCand0, tCount0) = time(cand0.count())
    println(f"[contain-prof] cand0 (no gate): $nCand0 pairs, " +
      f"build ${tCand0}%.2f s + count ${tCount0}%.2f s")
    cand0.unpersist(blocking = true)
    sweep()
    val ((g1, cand1), tCand1) = time {
      val p = Dedup.containmentCandidates(spark, dir,
        maxDf = maxDf, sigPrefilter = true)
      (p._1, p._2.persist())
    }
    val (nCand1, tCount1) = time(cand1.count())
    println(f"[contain-prof] cand  (gated):   $nCand1 pairs, " +
      f"build ${tCand1}%.2f s + count ${tCount1}%.2f s")
    cand1.unpersist(blocking = true)
    sweep()
    val (_, tFull) = time {
      Dedup.dedupContainment(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[contain-prof] full query: ${tFull}%.2f s")
    sweep()
    val (_, tFull2) = time {
      Dedup.dedupContainment(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[contain-prof] full query (rep2): ${tFull2}%.2f s")
    spark.stop()
  }
}
