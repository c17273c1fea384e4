package graft

/** Diagnostic main: prints the executed (post-AQE-planning) physical plan
  * of each named query — the tool used to keep plans honest (pushdown
  * reaching the scan, broadcasts where expected, no stray exchanges).
  * Usage: runMain graft.PlanDump [sfDir] [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.engine.GraftSession.getOrCreate("graft-plan-dump")
    // SPARK_GRAFT_EXEC=1: run the query first, so AQE's FINAL plan prints
    // (isFinalPlan=true) — runtime decisions (stage reuse, skew splits,
    // broadcast demotions) only exist there, not in the initial plan.
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    names.foreach { n =>
      println(s"===== $n")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // executes THIS df's QueryExecution (a .write would plan a fresh
        // one and leave this plan un-finalized)
        if (exec) df.queryExecution.toRdd.foreachPartition(_ => ())
        println(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
