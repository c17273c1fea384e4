package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: splits each registry query's rep time into BUILD
  * (the `fn(spark, dir)` call — plan construction, any build-time jobs
  * like profile/fit/count steps, scratch writes) and EXEC (the noop
  * sink write of the returned frame). The optimization rounds need
  * this split: a query whose cost is build-side wants fewer plan-time
  * jobs / cheaper construction, one whose cost is exec-side wants a
  * better physical plan — the two remedies don't overlap.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ONLY=a,b \
  *     sbt "runMain graft.BuildCostProf out.json"
  *
  * Reps interleave across passes (the Bench discipline); min build and
  * min exec are reported per query (mins may come from different
  * passes — each number answers "how cheap can this half be").
  */
object BuildCostProf {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("target/build_cost.json")
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
    graft.engine.Partitioning.autoTune(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3)
    val build = scala.collection.mutable.Map.empty[String, Double]
    val exec = scala.collection.mutable.Map.empty[String, Double]
    for (pass <- 0 until reps; (name, fn) <- selected) {
      try {
        graft.engine.CheckpointScope.withCheckpointScope(spark) {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          val b = (t1 - t0) / 1e9; val e = (t2 - t1) / 1e9
          build(name) = math.min(build.getOrElse(name, b), b)
          exec(name) = math.min(exec.getOrElse(name, e), e)
        }
      } catch { case ex: Throwable =>
        System.err.println(s"[buildcost] $name FAILED: ${ex.getMessage}")
      }
    }
    val rows = selected.map(_._1).filter(build.contains).map { n =>
      f""""$n":{"build":${build(n)}%.3f,"exec":${exec(n)}%.3f}"""
    }.mkString("{", ",", "}")
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, rows.getBytes("UTF-8"))
    println(s"[buildcost] wrote $outPath")
    spark.stop()
  }
}
