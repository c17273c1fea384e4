package graft

/** Diagnostic main: the DESCENDING lag class at the zipf ×100 corpus —
  * the r20 `WindowSpec.descending` flip measured where the dispatcher
  * matters (hot suppkey 11.5M of 60M rows). Chunked-desc vs plain-desc
  * with the same noop-sink + sweep protocol as LineWinProf; the asc
  * family's 6–7× win should carry, since DESC NULLS LAST is the exact
  * reverse total order and the rewrite's work is identical.
  *
  * Usage: runMain graft.DescWinProf [sfDir] [reps]
  */
object DescWinProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100z")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.engine.GraftSession.getOrCreate("graft-desc-win")
    import graft.operators.{Skew, WindowSpec}
    val spec = WindowSpec.Lineitem.copy(descending = true)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    for (r <- 1 to reps) {
      val tC = time(Skew.windowLagSkewOn(spark, li, spec)
        .write.format("noop").mode("overwrite").save())
      sweep()
      val tP = time(Skew.windowLagPlain(li, spec)
        .write.format("noop").mode("overwrite").save())
      sweep()
      println(f"[desc-win] rep=$r chunked=${tC}%.2f s plain=${tP}%.2f s " +
        f"speedup=${tP / tC}%.2f")
    }
    spark.stop()
  }
}
