package graft

/** Diagnostic main: the r20 window additions at the zipf ×100 corpus —
  * general-offset lag (k = 3) and the whole-partition first/last/nth
  * class, chunked vs plain on the hot-suppkey lineitem (11.5M of 60M
  * rows). Same protocol as LineWinProf/DescWinProf: noop sink,
  * persistent-RDD sweep between runs.
  *
  * Usage: runMain graft.FlastWinProf [sfDir] [reps]
  */
object FlastWinProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100z")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.engine.GraftSession.getOrCreate("graft-flast-win")
    import graft.operators.{Skew, WindowSpec}
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val flSpec = WindowSpec.Lineitem.copy(
      value = "l_shipdate", valueAlias = "sd",
      out = Seq("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      val tLagKC = time(noop(Skew.windowLagSkewOn(spark, li,
        WindowSpec.Lineitem, k = 3)))
      sweep()
      val tLagKP = time(noop(Skew.windowLagPlain(li,
        WindowSpec.Lineitem, k = 3)))
      sweep()
      println(f"[flast-win] rep=$r lag_k3 chunked=${tLagKC}%.2f s " +
        f"plain=${tLagKP}%.2f s speedup=${tLagKP / tLagKC}%.2f")
      val tFlC = time(noop(Skew.windowFirstLastSkewOn(spark, li, flSpec)))
      sweep()
      val tFlP = time(noop(Skew.windowFirstLastPlain(li, flSpec)))
      sweep()
      println(f"[flast-win] rep=$r firstlast chunked=${tFlC}%.2f s " +
        f"plain=${tFlP}%.2f s speedup=${tFlP / tFlC}%.2f")
    }
    spark.stop()
  }
}
