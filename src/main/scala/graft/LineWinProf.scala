package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: plain vs chunked lag-class window on LINEITEM at a
  * scaled corpus — the calibration probe for the dispatch floor
  * (`Skew.MinHotRows`): at zipf ×10 the hot suppkey holds ~1.16M rows
  * (share 0.19, UNDER the 2M floor → the dispatcher picks plain), at
  * zipf ×100 ~11.5M (over → chunked). This prints both branches' costs
  * so the floor's placement is a measurement, not a guess.
  *
  * Usage: runMain graft.LineWinProf [sfDir] [reps]
  */
object LineWinProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale10z")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.engine.GraftSession.getOrCreate("graft-line-win")
    import graft.operators.{Skew, WindowSpec}
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = graft.sources.Tables.table(spark, dir, "lineitem")
    val (hot, total) = Skew.topKeyStatsSampled(li, "l_suppkey")
    println(f"[line-win] sampled l_suppkey share=${
      hot.toDouble / math.max(1L, total)}%.4f hot=$hot " +
      s"(floor ${Skew.MinHotRows}) -> dispatch ${
        if (Skew.dispatchChunked(spark, li, "l_suppkey")) "CHUNKED"
        else "PLAIN"}")
    for (r <- 1 to reps) {
      val tChunk = time(noop(Skew.windowLagSkewOn(spark, li)))
      sweep()
      val tPlain = time(noop(Skew.windowLagPlain(li)))
      sweep()
      println(f"[line-win] rep=$r chunked=${tChunk}%.2f s " +
        f"plain=${tPlain}%.2f s plain/chunked=${tPlain / tChunk}%.2f")
    }
  }
}
