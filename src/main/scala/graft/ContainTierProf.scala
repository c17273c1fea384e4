package graft

/** Diagnostic main: the containment profile checkpoint's AUTO storage
  * tier measured end to end — REPS of the full `dedup_containment`
  * query with NO tier conf set, so the engine decision
  * (`Dedup.containProfileLevel`: estimated deserialized footprint vs
  * the free storage pool) picks the level. The r19 hand-set ledger
  * this automates: MEMORY_AND_DISK cold band 3.62 (185/51/58 s),
  * MEMORY_AND_DISK_SER band 1.29 (96/87/74 s) at the zipf ×100
  * corpus — the auto path should land the serialized band there with
  * nothing hand-picked.
  *
  * Usage: runMain graft.ContainTierProf [sfDir] [reps] [pinnedLevel]
  * (pinnedLevel sets spark.graft.contain.profileLevel — the control
  * arm of the cold-start A/B; omit for the engine decision.)
  */
object ContainTierProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100z")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.engine.GraftSession.getOrCreate("graft-contain-tier")
    args.lift(2).foreach(lvl =>
      spark.conf.set("spark.graft.contain.profileLevel", lvl))
    import graft.operators.Dedup
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    println(s"[contain-tier] docs sizeInBytes=" +
      docs.queryExecution.optimizedPlan.stats.sizeInBytes +
      s" freeStorage=" + spark.sparkContext.getExecutorMemoryStatus
        .values.map(_._2.toDouble).sum.toLong)
    println(s"[contain-tier] dir=$dir auto level = " +
      Dedup.containProfileLevel(spark, docs))
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    val times = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      Dedup.dedupContainment(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[contain-tier] rep=$r ${t}%.2f s")
      sweep()
      t
    }
    println(f"[contain-tier] band=${times.max / times.min}%.2f " +
      f"(${times.map(t => f"$t%.1f").mkString("/")} s)")
    spark.stop()
  }
}
