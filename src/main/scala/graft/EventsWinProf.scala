package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: the auto-dispatched window on the EVENTS shape at
  * scale — the WindowSpec generalization's measurement. At the zipf
  * ×100 corpus events carries a genuinely hot user (~15% of 10M rows),
  * so the dispatcher must pick the chunked rewrite and beat the plain
  * single-window plan whose hot partition cannot split.
  *
  * Usage: runMain graft.EventsWinProf [sfDir] [reps]
  */
object EventsWinProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100z")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.engine.GraftSession.getOrCreate("graft-events-win")
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
    val ev = graft.sources.Tables.events(spark, dir)
    val (hot, total) = Skew.topKeyStatsSampled(ev, "user_id")
    println(f"[events-win] sampled user_id share=${
      hot.toDouble / math.max(1L, total)}%.4f hot=$hot " +
      s"(threshold ${Skew.WindowSkewShare}, floor ${Skew.MinHotRows}) " +
      s"-> dispatch ${if (Skew.dispatchChunked(spark, ev, "user_id"))
        "CHUNKED" else "PLAIN"}")
    for (r <- 1 to reps) {
      val tAuto = time(noop(Skew.windowAutoOn(spark, ev, "lag",
        spec = WindowSpec.Events)))
      sweep()
      val tPlain = time(noop(Skew.windowLagPlain(ev, WindowSpec.Events)))
      sweep()
      println(f"[events-win] rep=$r auto=${tAuto}%.2f s " +
        f"plain=${tPlain}%.2f s ratio=${tPlain / tAuto}%.2f")
    }
  }
}
