package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Diagnostic main: per-JOB and per-STAGE wall-clock breakdown of named
  * registry queries — the empirical "where does the rep actually go"
  * instrument (guide §1.1) for a UI-less bench environment. Prints, per
  * query rep: each job (submit→end wall), each stage (task count, total
  * task time, max task time, name), so serial build-time jobs,
  * single-task stages, and stage-count overhead are all visible.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StageProf q1 q2"
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    val names = args.toSeq
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

    case class StageRec(name: String, var tasks: Int = 0,
                        var taskTimeMs: Long = 0L, var maxTaskMs: Long = 0L,
                        var submit: Long = 0L, var done: Long = 0L)
    val stages = mutable.Map.empty[Int, StageRec]
    val jobs = mutable.Map.empty[Int, (Long, Long, Seq[Int])] // submit,end,stages
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = (e.time, 0L, e.stageIds)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach { case (s, _, ids) =>
            jobs(e.jobId) = (s, e.time, ids)
          }
        }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages(e.stageInfo.stageId) =
            StageRec(e.stageInfo.name.split('\n').head.take(90),
              submit = System.currentTimeMillis())
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages.get(e.stageInfo.stageId).foreach { r =>
            r.tasks = e.stageInfo.numTasks
            r.done = System.currentTimeMillis()
          }
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          stages.get(e.stageId).foreach { r =>
            val ms = e.taskInfo.duration
            r.taskTimeMs += ms
            if (ms > r.maxTaskMs) r.maxTaskMs = ms
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // warmup
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    for (name <- names; rep <- 1 to reps) {
      stages.synchronized(stages.clear()); jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      var built = 0L
      try {
        graft.engine.CheckpointScope.withCheckpointScope(spark) {
          val df = SparkEntry.queries(name)(spark, sfDir)
          built = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
        }
      } catch { case e: Throwable =>
        println(s"[stageprof] $name FAILED: ${e.getMessage}")
      }
      val t1 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      println(f"===== $name rep$rep total=${(t1 - t0) / 1e9}%.2fs " +
        f"build=${(built - t0) / 1e9}%.2fs exec=${(t1 - built) / 1e9}%.2fs " +
        s"jobs=${jobs.size} stages=${stages.size}")
      jobs.toSeq.sortBy(_._1).foreach { case (jid, (s, e, ids)) =>
        println(f"  job $jid%3d wall=${(e - s) / 1e3}%.2fs stages=" +
          ids.mkString(","))
      }
      stages.toSeq.sortBy(_._1).foreach { case (sid, r) =>
        println(f"    stage $sid%3d tasks=${r.tasks}%3d " +
          f"wall=${(r.done - r.submit) / 1e3}%.2fs " +
          f"taskSum=${r.taskTimeMs / 1e3}%.2fs max=${r.maxTaskMs / 1e3}%.2fs " +
          r.name)
      }
    }
    spark.stop()
  }
}
