package graft

/** Diagnostic main: the window SQL seam measured end to end at scale —
  * the SAME plain SQL lag-class query, conf off (Spark's single-window
  * plan, hot task unsplittable) vs conf on (WindowAutoRewrite profiles
  * the key and splices the chunked rewrite). At the zipf ×100 corpus
  * the hot suppkey holds 11.5M of 60M rows, the regime the dispatcher
  * exists for.
  *
  * Usage: runMain graft.SqlWinProf [sfDir] [reps]
  */
object SqlWinProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100z")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.engine.GraftSession.getOrCreate("graft-sql-win")
    graft.plans.WindowAutoRewrite.ensureRule(spark)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("li_sql")
    val sql = """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        l_quantity,
        lag(l_quantity, 1) OVER w AS prev_qty,
        lead(l_quantity, 1) OVER w AS next_qty,
        CAST(row_number() OVER w AS BIGINT) AS rn
      FROM li_sql
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate,
        l_orderkey, l_linenumber, l_partkey, l_quantity,
        l_extendedprice)"""
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    def run(): (Double, Boolean) = {
      val df = spark.sql(sql)
      val t = time(df.write.format("noop").mode("overwrite").save())
      (t, df.queryExecution.executedPlan.toString.contains("pid#"))
    }
    for (r <- 1 to reps) {
      spark.conf.set(graft.plans.WindowAutoRewrite.ConfKey, "true")
      val (tOn, chunkedOn) = run()
      sweep()
      spark.conf.unset(graft.plans.WindowAutoRewrite.ConfKey)
      val (tOff, chunkedOff) = run()
      sweep()
      println(f"[sql-win] rep=$r ruleOn=${tOn}%.2f s (chunked=$chunkedOn) " +
        f"ruleOff=${tOff}%.2f s (chunked=$chunkedOff) " +
        f"speedup=${tOff / tOn}%.2f")
    }
  }
}
