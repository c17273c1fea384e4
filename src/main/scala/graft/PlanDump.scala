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
    names.foreach { n =>
      println(s"===== $n")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString)
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
