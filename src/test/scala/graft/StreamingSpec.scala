package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Structured Streaming specs: the streaming pipelines must agree with
  * their batch twins on the same input (the reference has no streaming at
  * all; this is north-star scope).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  /** Streaming file sources need a directory — stage the single events
    * parquet file into one.
    */
  lazy val eventsDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("part-00000.parquet"))
    tmp.toString
  }

  test("streaming windowed counts equal the batch aggregation") {
    val q = EventStreams.windowedCounts(
        EventStreams.readEventStream(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .agg(sum("n_events")).collect()(0).getLong(0)
      assert(streamed === 1000L)
      val batch = graft.operators.Relational.eventsWindow(spark, dir)
      assert(spark.table("win_counts").count() === batch.count())
    } finally q.stop()
  }

  test("stream over a not-yet-populated directory: definable, and " +
       "appended current-generation files flow through") {
    val tmp = java.nio.file.Files.createTempDirectory("events_empty")
    // definition-time probe finds nothing — falls back to the
    // normalized TimestampType schema instead of throwing
    val stream = EventStreams.readEventStream(spark, tmp.toString)
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("empty_start").start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_start").count() === 0L)
      // append a current-generation (TimestampType ts) file: the
      // already-running stream picks it up as a micro-batch
      graft.sources.Tables.events(spark, dir)
        .coalesce(1).write.mode("append").parquet(tmp.toString)
      q.processAllAvailable()
      assert(spark.table("empty_start").count() === 1000L)
    } finally q.stop()
  }

  test("a directory mixing ts generations fails fast at definition " +
       "time with the drift named") {
    val tmp = java.nio.file.Files.createTempDirectory("events_mixed")
    // one file of the on-disk generation (micros/NTZ ts) + one
    // normalized-TimestampType file — no fixed stream schema reads both
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("gen_ondisk.parquet"))
    graft.sources.Tables.events(spark, dir)
      .limit(10).coalesce(1).write.mode("append").parquet(tmp.toString)
    val e = intercept[IllegalStateException] {
      EventStreams.readEventStream(spark, tmp.toString)
    }
    assert(e.getMessage.contains("mixes ts generations"))
  }

  test("streaming dedup drops a fully replayed file") {
    val tmp = java.nio.file.Files.createTempDirectory("events_dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("b.parquet"))
    val q = EventStreams.dedupStream(
        EventStreams.readEventStream(spark, tmp.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 1000L)
      assert(spark.table("dedup_out").select("event_id").distinct()
        .count() === 1000L)
    } finally q.stop()
  }

  test("stream-stream view→purchase join matches the batch join") {
    val q = EventStreams.viewPurchaseJoin(
        EventStreams.readEventStream(spark, eventsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("vp_join").start()
    try {
      q.processAllAvailable()
      val ev = graft.sources.Tables.events(spark, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("ts").as("buy_ts"))
      val batch = views.join(buys, expr(
        "v_user = b_user AND buy_ts >= view_ts AND " +
          "buy_ts <= view_ts + interval 1 hour")).count()
      assert(spark.table("vp_join").count() === batch)
      assert(batch > 0L)
    } finally q.stop()
  }

  test("stream-static enrichment matches the batch join") {
    val q = EventStreams.enrichStream(
        EventStreams.readEventStream(spark, eventsDir),
        graft.sources.Tables.table(spark, dir, "customer"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enriched")
        .select("event_id", "c_mktsegment").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = EventStreams.eventsEnrich(spark, dir)
        .select("event_id", "c_mktsegment").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("two-source left-outer enrichment join: late enrichment buffers, " +
       "watermarks flush null-matches and evict state, both state stores " +
       "agree with the batch twin") {
    import graft.sources.Tables
    val ev = Tables.events(spark, dir)
    val maxTsMs = ev.agg(max(col("ts"))).collect()(0)
      .getTimestamp(0).getTime
    def sentinelTs(plusDays: Int) =
      new java.sql.Timestamp(maxTsMs + plusDays * 24L * 3600L * 1000L)
    // stage a coalesced parquet part file into a stream directory
    def stage(df: org.apache.spark.sql.DataFrame, streamDir: String,
              name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(streamDir, name))
      ()
    }
    val expected = EventStreams.eventsEnrichJoin(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(4)), Option(r.get(5)))).toSet

    def run(name: String): Set[(Long, Option[Any], Option[Any])] = {
      val fDir = java.nio.file.Files.createTempDirectory("ssj_facts").toString
      val eDir = java.nio.file.Files.createTempDirectory("ssj_enrich").toString
      stage(ev, fDir, "f0.parquet") // facts arrive first
      val q = EventStreams.enrichJoinStream(
          EventStreams.readEventStream(spark, fDir),
          EventStreams.readEnrichmentStream(spark, eDir))
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        // phase 1 — enrichment source still empty: nothing may emit.
        // Matches can't exist and the outer null-emission is
        // watermark-driven; a batch engine would have answered wrongly
        // here, the stream correctly BUFFERS.
        q.processAllAvailable()
        assert(spark.table(name).count() === 0L,
          s"$name: emitted before the enrichment source produced")
        // phase 2 — the late enrichment file arrives: matches emit
        stage(EventStreams.enrichmentRecords(ev), eDir, "e0.parquet")
        q.processAllAvailable()
        val matchedOnly = spark.table(name)
          .filter(col("signup_id").isNotNull).count()
        assert(matchedOnly > 0L, s"$name: no matches after enrichment")
        // phase 3 — far-future sentinels push BOTH watermarks past every
        // real row: pending unmatched facts flush as null-matches and
        // the join state evicts
        import spark.implicits._
        stage(Seq((-1L, sentinelTs(30), -1L, "view", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value",
            "props"), fDir, "f1.parquet")
        stage(Seq((-2L, sentinelTs(30), -2L, "segX"))
          .toDF("e_user", "eff_ts", "signup_id", "segment"),
          eDir, "e1.parquet")
        q.processAllAvailable()
        val progress = q.recentProgress.flatMap(_.stateOperators)
        assert(progress.nonEmpty, s"$name: no stateful operators")
        val peak = progress.map(_.numRowsTotal).max
        val fin = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        // eviction proof: the watermark pass must have DROPPED state —
        // only the two sentinel rows (inside their own horizon) may stay
        assert(fin < peak, s"$name: state never evicted (peak=$peak fin=$fin)")
        assert(fin <= 4L, s"$name: state not bounded after flush: $fin")
        spark.table(name).filter(col("event_id") >= 0L).collect()
          .map(r => (r.getLong(0), Option(r.get(4)), Option(r.get(5)))).toSet
      } finally q.stop()
    }

    val confKeys = Seq(
      "spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    val prev = confKeys.map(k => k -> spark.conf.getOption(k))
    val onDefault = run("ssj_default")
    assert(onDefault === expected)
    assert(onDefault.exists(_._2.isEmpty), "no null-match rows flushed")
    try {
      spark.conf.set(confKeys(0), "org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(confKeys(1), "true")
      assert(run("ssj_rocksdb") === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streaming materialization serves the rec_N layout via the pager") {
    val root = java.nio.file.Files.createTempDirectory("stream_res").toString
    val q = graft.exec.ResultMaterializer.materializeStream(
      EventStreams.readEventStream(spark, eventsDir)
        .select(col("event_id"), col("user_id"), col("event_type")),
      root, "q-stream")
    try {
      q.processAllAvailable()
      val rs = graft.exec.ResultMaterializer.open(s"$root/q-stream")
      assert(rs.files.nonEmpty)
      val pager = new graft.exec.CursorPager(spark, rs)
      val batchN = graft.sources.Tables.events(spark, dir).count()
      assert(pager.totalRows === batchN)
      // page it all back with the standard cursor API
      var cursor = Option(graft.exec.CursorPager.Start)
      var n = 0L
      while (cursor.isDefined) {
        val p = pager.page(cursor.get, 997)
        n += p.rows.length
        cursor = p.next
      }
      assert(n === batchN)
      // compaction refuses a stream-materialized dir unless the caller
      // asserts the stream is stopped
      intercept[IllegalArgumentException] {
        graft.exec.ResultMaterializer.compact(spark, s"$root/q-stream",
          minRowsPerFile = 100000L)
      }
      q.stop()
      val compacted = graft.exec.ResultMaterializer.compact(spark,
        s"$root/q-stream", minRowsPerFile = 100000L, allowStreamed = true)
      assert(compacted.totalRows === batchN)
    } finally q.stop()
  }

  test("exactly-once rec_N commit: a crash-replayed batch is a no-op — " +
       "no duplicate rows page out, the committed file is untouched") {
    val root = java.nio.file.Files.createTempDirectory("stream_eo").toString
    val qid = "q-replay"
    val stream = EventStreams.readEventStream(spark, eventsDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val q1 = graft.exec.ResultMaterializer.materializeStream(
      stream, root, qid)
    try q1.processAllAvailable() finally q1.stop()
    val resDir = java.nio.file.Paths.get(root, qid)
    val recFiles = java.nio.file.Files.list(resDir).iterator()
    val committed = Iterator.continually(recFiles)
      .takeWhile(_.hasNext).map(_.next())
      .filter(_.getFileName.toString.matches("rec_\\d+\\.parquet")).toVector
    assert(committed.nonEmpty)
    val mtimes = committed.map(p =>
      p -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    val sourceRows = graft.sources.Tables.events(spark, dir).count()

    // simulate the crash window: the sink committed rec_N but the engine
    // died BEFORE recording the batch in the checkpoint's commit log —
    // delete the latest commit record, so a restart re-delivers that
    // batchId to foreachBatch
    val commitsDir = resDir.resolve(".checkpoint").resolve("commits")
    val latest = java.nio.file.Files.list(commitsDir).iterator()
    val commitIds = Iterator.continually(latest).takeWhile(_.hasNext)
      .map(_.next()).filter(_.getFileName.toString.matches("\\d+")).toVector
    val newest = commitIds.maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(newest)
    java.nio.file.Files.deleteIfExists(
      commitsDir.resolve(s".${newest.getFileName}.crc"))

    val q2 = graft.exec.ResultMaterializer.materializeStream(
      stream, root, qid)
    try q2.processAllAvailable() finally q2.stop()

    // the replayed batch must have been skipped: same file set, every
    // committed file byte-untouched (mtime unchanged), and the pager
    // serves exactly the source's row count — zero duplicates
    committed.foreach { p =>
      assert(java.nio.file.Files.getLastModifiedTime(p) === mtimes(p),
        s"replay rewrote $p")
    }
    val rs = graft.exec.ResultMaterializer.open(resDir.toString)
    assert(rs.files.size === committed.size, "replay added files")
    assert(rs.totalRows === sourceRows,
      s"paged ${rs.totalRows} rows for $sourceRows source rows")
  }

  test("streaming sessionization emits sessions consistent with batch") {
    val q = EventStreams.sessionizeStream(
        EventStreams.readEventStream(spark, eventsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val streamedClosed = spark.table("sessions").count()
      val batch = EventStreams.eventsSessionize(spark, dir).count()
      // streaming (append mode) only emits CLOSED sessions; every closed
      // session must exist in the batch result, and open ones account for
      // the difference (one trailing session per user at most).
      val users = spark.read.parquet(s"$dir/events.parquet")
        .select("user_id").distinct().count()
      assert(streamedClosed <= batch)
      assert(batch - streamedClosed <= users)
    } finally q.stop()
  }

  test("stateful streams run on the RocksDB state store with changelog " +
       "checkpointing, and emit the same sessions as the default store") {
    // The 100-TB streaming posture (ROADMAP item): the default
    // HDFS-backed state store holds every key in executor memory; the
    // RocksDB provider spills state to local disk and changelog
    // checkpointing uploads per-batch deltas instead of full snapshots.
    // Pure configuration — the pipeline code is untouched — so prove it
    // here: same closed sessions, and the progress metrics show RocksDB
    // actually served the state ops.
    def runSessions(name: String): Set[(Long, Long, Long)] = {
      val q = EventStreams.sessionizeStream(
          EventStreams.readEventStream(spark, eventsDir))
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        val ops = q.lastProgress.stateOperators
        assert(ops.nonEmpty, s"$name: no stateful operators in progress")
        val rocks = ops.flatMap(
          _.customMetrics.keySet.toArray.map(_.toString))
          .exists(_.toLowerCase.contains("rocksdb"))
        val provider = spark.conf.getOption(
          "spark.sql.streaming.stateStore.providerClass")
        assert(rocks === provider.exists(_.contains("RocksDB")),
          s"$name: state-store metrics disagree with configured provider")
        spark.table(name).collect().map(r =>
          (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
            r.getAs[Long]("n_events"))).toSet
      } finally q.stop()
    }
    val confKeys = Seq(
      "spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    val prev = confKeys.map(k => k -> spark.conf.getOption(k))
    val baseline = runSessions("sessions_default_store")
    try {
      spark.conf.set(confKeys(0), "org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(confKeys(1), "true")
      val rocksdb = runSessions("sessions_rocksdb_store")
      assert(rocksdb === baseline)
      assert(baseline.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("events_retention: offset-0 covers each cohort; later offsets shrink") {
    import org.apache.spark.sql.functions._
    val ret = EventStreams.eventsRetention(spark, dir)
    val rows = ret.collect()
    assert(rows.nonEmpty)
    val at0 = rows.filter(_.getAs[Int]("offset_weeks") === 0)
      .map(r => r.getAs[String]("cohort_week") -> r.getAs[Long]("n_users"))
      .toMap
    // a user is active in their signup week by definition, so offset 0
    // equals the cohort size and every later offset is a subset of it
    val cohortSizes = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_format(date_trunc("week", min(col("ts"))), "yyyy-MM-dd")
        .as("cw"))
      .groupBy("cw").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(at0 === cohortSizes)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <=
        at0(r.getAs[String]("cohort_week")))
    }
  }

  test("events_funnel: stages ordered, timestamps monotone, one user audited") {
    import org.apache.spark.sql.functions._
    val rows = EventStreams.eventsFunnel(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Int]("stage")
      assert(stage >= 0 && stage <= 3)
      val ts = Seq("signup_ts", "view_ts", "purchase_ts")
        .map(c => Option(r.getAs[String](c)))
      // stage counts exactly the reached prefix, and reached stages are
      // present in time order
      assert(ts.count(_.isDefined) === stage)
      assert(ts.takeWhile(_.isDefined) === ts.filter(_.isDefined))
      val reached = ts.flatten
      assert(reached.zip(reached.tail).forall { case (a, b) => a <= b })
    }
    // audit one stage-3 user against a direct recompute
    rows.find(_.getAs[Int]("stage") === 3).foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val ev = graft.sources.Tables.events(spark, dir)
        .filter(col("user_id") === uid)
        .select(col("event_type"), col("ts")).collect()
        .map(x => (x.getString(0), x.getTimestamp(1)))
      val t1 = ev.filter(_._1 == "signup").map(_._2).min
      val t2 = ev.filter(e => e._1 == "view" && !e._2.before(t1))
        .map(_._2).min
      val t3 = ev.filter(e => e._1 == "purchase" && !e._2.before(t2))
        .map(_._2).min
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      assert(r.getAs[String]("signup_ts") === fmt.format(t1))
      assert(r.getAs[String]("view_ts") === fmt.format(t2))
      assert(r.getAs[String]("purchase_ts") === fmt.format(t3))
    }
  }

  test("streaming anomaly scores equal the batch twin on closed hours") {
    val q = EventStreams.anomalyStream(
        EventStreams.readEventStream(spark, eventsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("anomaly_out").start()
    try {
      q.processAllAvailable()
      // the scoring flush rides the NO-DATA microbatch that runs after
      // the watermark advances; processAllAvailable does not wait for
      // it, so poll briefly
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (spark.table("anomaly_out").isEmpty &&
             System.nanoTime() < deadline) Thread.sleep(200)
      val streamed = spark.table("anomaly_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)),
            r.getBoolean(5))).toMap
      assert(streamed.nonEmpty)
      // the batch twin on the same file: every streamed (type, hour) row
      // must agree on count, baseline size, z, and flag BIT FOR BIT
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:00:00")
      val batch = EventStreams.eventsAnomaly(spark, dir).collect()
        .map { r =>
          val hr = java.time.LocalDateTime.parse(r.getString(1), fmt)
            .toEpochSecond(java.time.ZoneOffset.UTC) / 3600L
          (r.getString(0), hr) ->
            (r.getLong(2), r.getLong(3),
              if (r.isNullAt(4)) None else Some(r.getDouble(4)),
              r.getBoolean(5))
        }.toMap
      streamed.foreach { case (k, v) =>
        assert(batch.contains(k), s"streamed extra row $k")
        assert(batch(k) === v, s"mismatch at $k")
      }
      // watermark-driven finalization emitted everything but the last
      // horizon's worth of hours
      assert(streamed.size >= batch.size -
        5 * (EventStreams.AnomalyBaselineHours / 6) - 5)
    } finally q.stop()
  }

  test("events_anomaly: warmup yields null z, flags match the 3-sigma rule, " +
       "one row audited") {
    import org.apache.spark.sql.functions._
    val r = EventStreams.eventsAnomaly(spark, dir).localCheckpoint()
    // totals conserve the event count
    val total = graft.sources.Tables.events(spark, dir).count()
    assert(r.agg(sum("cnt")).head.getLong(0) === total)
    // z exists only past the warmup floor; the flag is exactly |z| >= 3
    assert(r.filter(col("z").isNotNull &&
      col("n_base") < EventStreams.AnomalyMinBaseline).count() === 0L)
    assert(r.filter(col("anomaly") =!=
      coalesce(abs(col("z")) >= EventStreams.AnomalyZ, lit(false)))
      .count() === 0L)
    // audit one scored row end to end: rebuild its trailing window from
    // the hourly counts and recompute the z-score
    val hourly = r.select(col("event_type"), col("hour_start"), col("cnt"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val probe = r.filter(col("z").isNotNull).orderBy(col("event_type"),
      col("hour_start")).head()
    val (et, hs) = (probe.getString(0), probe.getString(1))
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:00:00")
    val hr = java.time.LocalDateTime.parse(hs, fmt)
    val base = (1 to EventStreams.AnomalyBaselineHours).flatMap { k =>
      hourly.get((et, hr.minusHours(k.toLong).format(fmt)))
    }
    assert(base.length === probe.getLong(3))
    val n = base.length.toDouble
    val mean = base.sum / n
    val variance = (base.map(x => x.toDouble * x).sum - base.sum *
      (base.sum / n)) / (n - 1.0)
    val z = (probe.getLong(2) - mean) / math.sqrt(variance)
    assert(math.abs(probe.getDouble(4) - z) < 2e-3)
  }

  test("streaming heavy users: MG emissions honor the deterministic " +
       "bound and completeness guarantees vs batch-exact counts") {
    val q = EventStreams.heavyUsersStream(
        EventStreams.readEventStream(spark, eventsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("heavy_out").start()
    try {
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (spark.table("heavy_out").isEmpty &&
             System.nanoTime() < deadline) Thread.sleep(200)
      val streamed = spark.table("heavy_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2),
          r.getLong(3)))
      assert(streamed.nonEmpty)
      // batch-exact (hr, user) counts and hour totals
      val exact = graft.sources.Tables.events(spark, dir)
        .select(expr("unix_timestamp(ts) div 3600").as("hr"),
          col("user_id"))
        .groupBy("hr", "user_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val hourTotals = exact.groupBy(_._1._1).view
        .mapValues(_.values.sum).toMap
      val byHour = streamed.groupBy(_._1._1)
      val cap = EventStreams.HeavyUsersCap
      for ((hr, rows) <- byHour) {
        val nEv = rows.head._2._2
        assert(nEv === hourTotals(hr), s"hour $hr total")
        val bound = nEv / (cap + 1)
        val survivors = rows.map(_._1._2).toSet
        rows.foreach { case ((_, u), (est, _)) =>
          val t = exact((hr, u))
          assert(est <= t, s"hr=$hr u=$u overestimate")
          assert(t - est <= bound, s"hr=$hr u=$u undercount")
        }
        // completeness: any user above the bound must have survived
        for (((h, u), t) <- exact if h == hr && t > bound)
          assert(survivors.contains(u), s"hr=$hr heavy user $u dropped")
      }
      // the watermark closed (and so emitted) all but the last hour-ish
      val allHours = hourTotals.keySet
      assert(byHour.keySet.size >= allHours.size - 2)
      // closed hours' state was removed: each (hr, user) emitted once
      assert(streamed.map(_._1).distinct.length === streamed.length)
    } finally q.stop()
  }

  test("streaming dedup ingest fold equals the one-shot batch dedup, " +
       "bit for bit") {
    import graft.streaming.DedupStream
    import graft.operators.Dedup
    // cap headroom: the per-batch vs delta-wide MaxBucket caps only
    // diverge when a bucket approaches the cap — assert none does, so
    // the equality below is exercised where the contract says it holds.
    // Measured PRE-cap: the capped bands output silently DROPS whole
    // over-cap buckets, so a post-cap max would read small exactly when
    // the divergence is live.
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val delta = docs.filter(
      col("doc_id") % Dedup.IndexDeltaMod === Dedup.IndexDeltaRem)
    val maxBucket =
      Dedup.minhashBucketSizes(spark, delta.select("doc_id", "text"))
        .agg(max("n")).collect()(0).getLong(0)
    assert(maxBucket < Dedup.MaxBucket / 2, s"cap headroom gone: $maxBucket")
    val streamed = DedupStream.foldBoundedDelta(spark, dir, chunks = 3)
      .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
    val batch = Dedup.dedupIncrementalMinhash(spark, dir)
      .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
    // the fold actually flagged duplicates across batch boundaries or
    // against the seed (a vacuous all-keep pass would "match" trivially
    // on a corpus with no dups — guard against that)
    assert(batch.count(r => r(3) == false) > 0)
  }

  test("dedup ingest bootstraps an UNSEEDED store: batch 0 dedups " +
       "against itself only and seeds the index for batch 1") {
    import graft.streaming.DedupStream
    val root = java.nio.file.Files
      .createTempDirectory("dedup_boot").resolve("store").toString
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val b0 = docs.filter(col("doc_id") % 10 === 1)
    DedupStream.processBatch(b0, root, 0L) // NO seed() before this
    val v0 = spark.read.parquet(s"$root/verdicts/b=0")
    assert(v0.count() === b0.count())
    // batch 1's exact copies of batch-0 docs must match the index the
    // bootstrap built (ids offset above every original, so verdicts
    // land on the copies)
    val b1 = b0.withColumn("doc_id", col("doc_id") + 1000000L)
    DedupStream.processBatch(b1, root, 1L)
    val v1 = spark.read.parquet(s"$root/verdicts/b=1")
    assert(v1.count() === b1.count())
    assert(v1.filter(!col("keep")).count() === b1.count(),
      "exact copies must all be flagged against the bootstrapped index")
  }

  test("dedup ingest compaction: folding all generations into a fresh " +
       "partitioned seed is verdict-invariant for the next batch, " +
       "resets the store to one generation, and a torn compaction " +
       "(marker written, old dirs still present) is finished at the " +
       "next compact() — with the duplicate window itself " +
       "verdict-correct") {
    import graft.streaming.DedupStream
    import graft.operators.Dedup
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 < 5)
    val b0 = docs.filter(col("doc_id") % 10 === 5)
    val b1 = docs.filter(col("doc_id") % 10 === 6)
    // twin stores, identical seed + batch 0
    val roots = Seq("a", "b").map { t =>
      val r = java.nio.file.Files
        .createTempDirectory(s"dedup_compact_$t").resolve("store").toString
      DedupStream.seed(spark, corpus, r)
      DedupStream.processBatch(b0, r, 0L)
      r
    }
    val Seq(rootA, rootB) = roots
    // A compacts; B does not
    DedupStream.compact(spark, rootA)
    def gens(root: String, kind: String): Seq[String] =
      Option(new java.io.File(root, kind).listFiles)
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSeq
    assert(gens(rootA, "bands") === Seq("b=seed0"))
    assert(gens(rootA, "docs") === Seq("b=seed0"))
    // the compacted seed is partitioned (sidecars present)
    assert(Dedup.indexBuckets(s"$rootA/bands/b=seed0").nonEmpty)
    assert(Dedup.indexBuckets(s"$rootA/docs/b=seed0").nonEmpty)
    // batch 1 against compacted vs uncompacted: verdicts identical
    DedupStream.processBatch(b1, rootA, 1L)
    DedupStream.processBatch(b1, rootB, 1L)
    def v1(root: String) = spark.read.parquet(s"$root/verdicts/b=1")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(v1(rootA) === v1(rootB))
    assert(v1(rootA).exists(r => r(3) == false),
      "degenerate: batch 1 flagged nothing — the equality proves little")
    // torn compaction on A: write a marker listing a still-present fake
    // superseded dir; the next compact() must finish the deletion AND
    // retire the marker (cleanup is O(pending), markers don't accrue)
    val stale = java.nio.file.Paths.get(rootA, "bands", "b=999")
    java.nio.file.Files.createDirectories(stale)
    val tornMarker = java.nio.file.Paths.get(
      rootA, "commits", "compact-7")
    java.nio.file.Files.write(tornMarker, stale.toString.getBytes("UTF-8"))
    // a LEGACY marker (path-only lines, no recorded mtime): cleanup
    // falls back to the strictly-older-than-marker guard, so pin the
    // marker newer than the dir instead of racing the mtime tick
    tornMarker.toFile.setLastModified(
      stale.toFile.lastModified() + 60000L)
    // the r18 recorded-mtime protocol closes the legacy guard's one
    // leak: a superseded dir whose mtime TIES its marker's (same-tick
    // creation on a coarse-granularity filesystem) is still reclaimed,
    // because staleness is recorded-mtime equality, not marker-relative
    // age — pin the tie explicitly
    val tied = java.nio.file.Paths.get(rootA, "bands", "b=998")
    java.nio.file.Files.createDirectories(tied)
    val tiedMarker = java.nio.file.Paths.get(rootA, "commits", "compact-6")
    java.nio.file.Files.write(tiedMarker,
      s"${tied.toFile.lastModified()}\t$tied".getBytes("UTF-8"))
    tiedMarker.toFile.setLastModified(tied.toFile.lastModified())
    // next id comes from live seed-dir suffixes (b=seed0 -> 1), not the
    // retired marker's 7: markers are deleted after cleanup, so seed
    // dirs carry id monotonicity now
    DedupStream.compact(spark, rootA) // folds b=seed0 + b=1 into b=seed1
    assert(!java.nio.file.Files.exists(stale))
    assert(!java.nio.file.Files.exists(tornMarker),
      "finished marker must be retired")
    assert(!java.nio.file.Files.exists(tied),
      "a tied-mtime superseded dir must be reclaimed under the " +
        "recorded-mtime protocol (the legacy guard's leak)")
    assert(!java.nio.file.Files.exists(tiedMarker))
    assert(gens(rootA, "bands") === Seq("b=seed1"))
    // the duplicate WINDOW is correct: a store holding every gen TWICE
    // (old + compacted, the mid-compaction state) yields the same
    // verdicts — duplicates collapse in dup_of and the verify regroup
    val rootDup = java.nio.file.Files
      .createTempDirectory("dedup_compact_dup").resolve("store").toString
    DedupStream.seed(spark, corpus, rootDup)
    DedupStream.processBatch(b0, rootDup, 0L)
    spark.read.parquet(s"$rootDup/bands/b=seed").drop("pb")
      .write.parquet(s"$rootDup/bands/b=888")
    spark.read.parquet(s"$rootDup/bands/b=0")
      .write.parquet(s"$rootDup/bands/b=889")
    spark.read.parquet(s"$rootDup/docs/b=seed").drop("dd")
      .write.parquet(s"$rootDup/docs/b=888")
    spark.read.parquet(s"$rootDup/docs/b=0")
      .write.parquet(s"$rootDup/docs/b=889")
    DedupStream.processBatch(b1, rootDup, 1L)
    assert(v1(rootDup) === v1(rootB))
  }

  test("tie-surviving legacy generation: the survivor-rewrite makes the " +
       "NEXT cleanup pass reclaim it with no compaction in between; a " +
       "survivor that changes between passes is ceded as live") {
    import graft.streaming.StoreProtocol
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("survivor").toString
    val dir = Paths.get(root, "bands", "b=997")
    Files.createDirectories(dir)
    val marker = Paths.get(root, "commits", "compact-3")
    Files.createDirectories(marker.getParent)
    // LEGACY marker line (path only, no recorded mtime) with the dir
    // TYING the marker's mtime — the pre-r18 guard's ambiguous case
    Files.write(marker, dir.toString.getBytes("UTF-8"))
    marker.toFile.setLastModified(dir.toFile.lastModified())
    StoreProtocol.finishPendingCleanup(root)
    // pass 1: the tie is ambiguous (same-tick supersede vs same-tick
    // re-creation) — survive, but REWRITE the marker in recorded form
    // with the observed mtime instead of abandoning the survivor
    assert(Files.exists(dir), "ambiguous tie must not be deleted blind")
    assert(Files.exists(marker), "marker must persist for the survivor")
    assert(new String(Files.readAllBytes(marker), "UTF-8") ===
      s"${dir.toFile.lastModified()}\t$dir")
    // the pending id stays reserved while the marker persists
    assert(StoreProtocol.pendingCompactIds(root) === Seq(3))
    StoreProtocol.finishPendingCleanup(root)
    // pass 2, NO compaction in between: unchanged since observed ⇒
    // superseded-immutable ⇒ reclaimed; marker retired (the pre-rewrite
    // protocol leaked this dir permanently)
    assert(!Files.exists(dir), "tie survivor must be reclaimed by the " +
      "next cleanup pass")
    assert(!Files.exists(marker))
    // and a survivor WRITTEN between passes is live data: it survives
    // every pass and the marker retires after ceding it
    val live = Paths.get(root, "bands", "b=996")
    Files.createDirectories(live)
    val m2 = Paths.get(root, "commits", "compact-4")
    Files.write(m2, live.toString.getBytes("UTF-8"))
    m2.toFile.setLastModified(live.toFile.lastModified())
    StoreProtocol.finishPendingCleanup(root)
    assert(Files.exists(live) && Files.exists(m2))
    live.toFile.setLastModified(live.toFile.lastModified() + 60000L)
    StoreProtocol.finishPendingCleanup(root)
    assert(Files.exists(live), "re-created live data must survive")
    assert(!Files.exists(m2), "marker retired after ceding the live dir")
  }

  test("streaming ANN ingest fold equals the one-shot batch search, " +
       "bit for bit") {
    import graft.streaming.AnnStream
    import graft.operators.Ann
    val streamed = AnnStream.foldBoundedDelta(spark, dir, chunks = 3)
      .collect().map(_.toSeq)
      .sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val batch = Ann.annIncremental(spark, dir)
      .collect().map(_.toSeq)
      .sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (a, b) => assert(a === b) }
    // non-vacuous: the fold actually ranked neighbors for every delta
    // query (an empty result would "match" an empty batch trivially)
    val nQueries = streamed.map(_.head).distinct.length
    assert(nQueries > 0 && streamed.length >= nQueries)
  }

  test("streaming ANN ingest exactly-once: a committed batch " +
       "re-delivered is a no-op; a crash-torn batch replays whole; " +
       "arrivals land in the lake") {
    import graft.streaming.AnnStream
    import graft.operators.Ann
    val root = java.nio.file.Files
      .createTempDirectory("ann_once").resolve("store").toString
    val centroids = Ann.fitCentroids(spark, dir,
      Ann.ivfCellsFor(Ann.corpusCount(spark, dir)))
    AnnStream.seed(spark, dir, root)
    val delta = graft.sources.Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") % Ann.IncDeltaMod === Ann.IncDeltaRem)
      .select(col("vec_id"), col("embedding"))
    val b0 = delta.filter(col("vec_id") % 20 === 7)  // half the carve
    val b1 = delta.filter(col("vec_id") % 20 === 17) // the other half
    AnnStream.processBatch(b0, root, 0L, centroids)
    val r0 = spark.read.parquet(s"$root/results/b=0").collect().toSet
    assert(r0.nonEmpty)
    // arrivals landed in the lake with their standing-fit assignment
    val landed = spark.read.parquet(s"$root/cells/b=0")
    assert(landed.count() === b0.count())
    assert(landed.columns.toSet === Set("vec_id", "embedding", "cell"))
    // redelivery of the committed id: byte-identical results
    AnnStream.processBatch(b0, root, 0L, centroids)
    assert(spark.read.parquet(s"$root/results/b=0").collect().toSet
      === r0)
    // crash window: batch 1 wrote partial results + cells but died
    // BEFORE the marker — replay must clean the partials, rerun whole
    b0.limit(2).write.parquet(s"$root/results/b=1") // torn garbage
    b1.limit(3).select(col("vec_id"), col("embedding"), lit(0).as("cell"))
      .write.parquet(s"$root/cells/b=1")
    AnnStream.processBatch(b1, root, 1L, centroids)
    val r1 = spark.read.parquet(s"$root/results/b=1")
    assert(r1.columns.toSeq ===
      Seq("q_id", "rank", "cand_id", "cos_r", "cell"))
    assert(spark.read.parquet(s"$root/cells/b=1").count() === b1.count())
    // the two-batch union equals the batch operator on the full carve:
    // per-query independence means ANY batching folds to the same rows
    val union = Seq("b=0", "b=1")
      .flatMap(g => spark.read.parquet(s"$root/results/$g")
        .collect().map(_.toSeq))
      .sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val batch = Ann.annIncremental(spark, dir)
      .collect().map(_.toSeq)
      .sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    assert(union === batch)
  }

  test("streaming ANN ingest over a FLAT (unpartitioned) seed — the " +
       "measurement A/B control — yields results identical to the " +
       "partitioned layout's") {
    import graft.streaming.AnnStream
    import graft.operators.Ann
    val centroids = Ann.fitCentroids(spark, dir,
      Ann.ivfCellsFor(Ann.corpusCount(spark, dir)))
    val b0 = graft.sources.Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") % Ann.IncDeltaMod === Ann.IncDeltaRem)
      .filter(col("vec_id") % 20 === 7)
      .select(col("vec_id"), col("embedding"))
    val results = Seq(true, false).map { part =>
      val r = java.nio.file.Files
        .createTempDirectory(s"ann_flat_$part").resolve("store").toString
      AnnStream.seed(spark, dir, r, partitioned = part)
      AnnStream.processBatch(b0, r, 0L, centroids)
      spark.read.parquet(s"$r/results/b=0").collect().map(_.toSeq)
        .sortBy(x => (x.head.asInstanceOf[Long], x(1).asInstanceOf[Long]))
    }
    assert(results(0).nonEmpty)
    assert(results(0) === results(1))
  }

  test("streaming ANN store compaction: folding arrivals into a fresh " +
       "seed expands the search scope to them (pinned against the " +
       "union-index rank), resets the store to one generation, and a " +
       "torn-state re-fold dedups instead of inflating ranks") {
    import graft.streaming.AnnStream
    import graft.operators.Ann
    val root = java.nio.file.Files
      .createTempDirectory("ann_compact").resolve("store").toString
    val centroids = Ann.fitCentroids(spark, dir,
      Ann.ivfCellsFor(Ann.corpusCount(spark, dir)))
    AnnStream.seed(spark, dir, root)
    val delta = graft.sources.Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") % Ann.IncDeltaMod === Ann.IncDeltaRem)
      .select(col("vec_id"), col("embedding"))
    val b0 = delta.filter(col("vec_id") % 20 === 7)
    val b1 = delta.filter(col("vec_id") % 20 === 17)
    AnnStream.processBatch(b0, root, 0L, centroids)
    // expected post-compaction scope: seed + b0, computed BEFORE the
    // fold from the independent pre-compaction reads
    val unionIdx = spark.read.parquet(s"$root/cells/b=seed")
      .select(col("vec_id"), col("embedding"), col("cell"))
      .unionByName(spark.read.parquet(s"$root/cells/b=0"))
    val expected = Ann.incrementalRank(
        Ann.incrementalProbes(b1, centroids), unionIdx)
      .collect().map(_.toSeq)
      .sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val seedRows = spark.read.parquet(s"$root/cells/b=seed").count() +
      b0.count()
    AnnStream.compact(spark, root)
    def gens(): Seq[String] =
      Option(new java.io.File(root, "cells").listFiles)
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
        .toSeq.sorted
    assert(gens() === Seq("b=seed0"))
    assert(graft.operators.Dedup.indexFilesManifest(
      s"$root/cells/b=seed0").nonEmpty)
    assert(spark.read.parquet(s"$root/cells/b=seed0").count() === seedRows)
    // post-compaction batch ranks against corpus + folded arrivals
    AnnStream.processBatch(b1, root, 1L, centroids)
    val got = spark.read.parquet(s"$root/results/b=1")
      .collect().map(_.toSeq)
      .sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    assert(got === expected)
    // the scope really widened: some neighbor comes from batch 0
    val b0Ids = b0.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got.exists(r => b0Ids.contains(r(2).asInstanceOf[Long])),
      "no batch-0 arrival ranked as a neighbor — scope expansion unproven")
    // torn-state re-fold: a duplicate generation (the mid-compaction
    // state) must dedup away, not double the index
    def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(from)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.foreach { p =>
          val t = to.resolve(from.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(t)
          else java.nio.file.Files.copy(p, t)
        }
      } finally walk.close()
    }
    copyDir(java.nio.file.Paths.get(root, "cells", "b=seed0"),
      java.nio.file.Paths.get(root, "cells", "b=777"))
    AnnStream.compact(spark, root)
    assert(gens() === Seq("b=seed1"))
    assert(spark.read.parquet(s"$root/cells/b=seed1").count()
      === seedRows + b1.count())
  }

  test("ann ingest auto-compaction: processBatch consolidates the flat " +
       "generations past the byte-fraction threshold, not below it; the " +
       "serving scope is untouched so every batch's results are " +
       "invariant — including one processed AFTER a consolidation") {
    import graft.streaming.AnnStream
    import graft.operators.Ann
    val centroids = Ann.fitCentroids(spark, dir,
      Ann.ivfCellsFor(Ann.corpusCount(spark, dir)))
    val delta = graft.sources.Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") % Ann.IncDeltaMod === Ann.IncDeltaRem)
      .select(col("vec_id"), col("embedding"))
    // three-way exact split of the carve (vec_id%10==7 <=> %30 in
    // {7,17,27}) so batch 2 runs on a store that has ALREADY
    // consolidated batches 0+1
    val Seq(b0, b1, b2) =
      Seq(7, 17, 27).map(m => delta.filter(col("vec_id") % 30 === m))
    def gens(root: String): Seq[String] =
      Option(new java.io.File(root, "cells").listFiles)
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
        .toSeq.sorted
    val Seq(rootAuto, rootManual) = Seq("auto", "manual").map { t =>
      val r = java.nio.file.Files
        .createTempDirectory(s"ann_auto_$t").resolve("store").toString
      AnnStream.seed(spark, dir, r)
      r
    }
    // tiny fraction = the trigger condition always holds once raw
    // generations exist; the control store disables the policy
    val eps = 1e-9
    AnnStream.processBatch(b0, rootAuto, 0L, centroids,
      autoCompactFraction = eps)
    AnnStream.processBatch(b0, rootManual, 0L, centroids,
      autoCompactFraction = 0)
    // a single raw generation has nothing to consolidate with: the
    // <=1 guard keeps the trigger a no-op
    assert(gens(rootAuto) === Seq("b=0", "b=seed"))
    AnnStream.processBatch(b1, rootAuto, 1L, centroids,
      autoCompactFraction = eps)
    AnnStream.processBatch(b1, rootManual, 1L, centroids,
      autoCompactFraction = 0)
    assert(gens(rootAuto) === Seq("b=fold0", "b=seed"),
      "past the threshold the raw generations must consolidate")
    assert(gens(rootManual) === Seq("b=0", "b=1", "b=seed"),
      "policy disabled: raw generations accumulate")
    assert(spark.read.parquet(s"$rootAuto/cells/b=fold0").count()
      === b0.count() + b1.count())
    // batch 2 runs against the consolidated store; a later trigger
    // re-folds fold0 + b=2 under the next id
    AnnStream.processBatch(b2, rootAuto, 2L, centroids,
      autoCompactFraction = eps)
    AnnStream.processBatch(b2, rootManual, 2L, centroids,
      autoCompactFraction = 0)
    assert(gens(rootAuto) === Seq("b=fold1", "b=seed"),
      "fold + raw must re-consolidate under a fresh id")
    assert(spark.read.parquet(s"$rootAuto/cells/b=fold1").count()
      === b0.count() + b1.count() + b2.count())
    // result invariance, every batch — consolidation preserves the
    // serving scope by construction (searches read the newest seed)
    for (g <- Seq("b=0", "b=1", "b=2")) {
      def rows(r: String) = spark.read.parquet(s"$r/results/$g")
        .collect().map(_.toSeq)
        .sortBy(x => (x.head.asInstanceOf[Long], x(1).asInstanceOf[Long]))
      assert(rows(rootAuto) === rows(rootManual),
        s"results/$g must be invariant under auto-consolidation")
      assert(rows(rootAuto).nonEmpty)
    }
    // the default fraction does NOT fire against a corpus-sized seed
    // (raw arrivals are a small fraction of the serving bytes)
    val rootDef = java.nio.file.Files
      .createTempDirectory("ann_auto_def").resolve("store").toString
    AnnStream.seed(spark, dir, rootDef)
    AnnStream.processBatch(b0, rootDef, 0L, centroids)
    AnnStream.processBatch(b1, rootDef, 1L, centroids)
    assert(gens(rootDef) === Seq("b=0", "b=1", "b=seed"),
      "below the threshold the store must stay un-consolidated")
    // the semantic rebuild still folds EVERYTHING — seed + fold — and
    // its scope expansion matches the manual store's
    AnnStream.compact(spark, rootAuto)
    AnnStream.compact(spark, rootManual)
    assert(gens(rootAuto) === Seq("b=seed2"))
    val na = spark.read.parquet(s"$rootAuto/cells/b=seed2").count()
    val nm = spark.read.parquet(
      s"$rootManual/cells/${gens(rootManual).head}").count()
    assert(na === nm, "post-rebuild scope must match the manual store")
  }

  test("dedup ingest auto-compaction: processBatch compacts itself past " +
       "the byte-fraction threshold, not below it, and the next batch's " +
       "verdicts are invariant") {
    import graft.streaming.DedupStream
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def gens(root: String, kind: String): Seq[String] =
      Option(new java.io.File(root, kind).listFiles)
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
        .toSeq.sorted
    // SMALL seed (one decile) + same-sized batch: flat/seed ~ 1 > 0.5,
    // so the default policy must fire right after batch 0 commits
    val b0 = docs.filter(col("doc_id") % 10 === 2)
    val b1 = docs.filter(col("doc_id") % 10 === 3)
    val roots = Seq("auto", "manual").map { t =>
      val r = java.nio.file.Files
        .createTempDirectory(s"dedup_auto_$t").resolve("store").toString
      DedupStream.seed(spark, docs.filter(col("doc_id") % 10 < 1), r)
      r
    }
    val Seq(rootAuto, rootManual) = roots
    DedupStream.processBatch(b0, rootAuto, 0L) // default policy: fires
    DedupStream.processBatch(b0, rootManual, 0L, autoCompactFraction = 0)
    assert(gens(rootAuto, "bands") === Seq("b=seed0"),
      "past the threshold the store must have compacted itself")
    assert(gens(rootManual, "bands") === Seq("b=0", "b=seed"),
      "policy disabled: generations accumulate")
    // verdict invariance across the self-trigger
    DedupStream.processBatch(b1, rootAuto, 1L, autoCompactFraction = 0)
    DedupStream.processBatch(b1, rootManual, 1L, autoCompactFraction = 0)
    def v1(root: String) = spark.read.parquet(s"$root/verdicts/b=1")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(v1(rootAuto) === v1(rootManual))
    // BELOW the threshold nothing fires: a big seed (8 deciles) against
    // a one-decile batch is ~0.125 of seed bytes
    val rootBig = java.nio.file.Files
      .createTempDirectory("dedup_auto_big").resolve("store").toString
    DedupStream.seed(spark, docs.filter(col("doc_id") % 10 < 8), rootBig)
    DedupStream.processBatch(docs.filter(col("doc_id") % 10 === 8),
      rootBig, 0L)
    assert(gens(rootBig, "bands") === Seq("b=0", "b=seed"),
      "below the threshold the store must stay un-compacted")
  }

  test("compaction crash liveness: a moved-but-unmarked generation " +
       "(crash between the moves and the marker) gets a FRESH id at " +
       "the next compact; a stale marker never deletes a newer live " +
       "generation") {
    import graft.streaming.DedupStream
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files
      .createTempDirectory("dedup_liveness").resolve("store").toString
    DedupStream.seed(spark, docs.filter(col("doc_id") % 10 < 3), root)
    DedupStream.processBatch(docs.filter(col("doc_id") % 10 === 3),
      root, 0L, autoCompactFraction = 0)
    DedupStream.compact(spark, root) // -> b=seed0, marker retired
    def gens(kind: String): Seq[String] =
      Option(new java.io.File(root, kind).listFiles)
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
        .toSeq.sorted
    assert(gens("bands") === Seq("b=seed0"))
    // simulate the crash window: a compact moved b=seed3 into the tree
    // and died before writing compact-3 — no marker records id 3
    def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(from)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.foreach { p =>
          val t = to.resolve(from.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(t)
          else java.nio.file.Files.copy(p, t)
        }
      } finally walk.close()
    }
    Seq("bands", "docs").foreach { k =>
      copyDir(java.nio.file.Paths.get(root, k, "b=seed0"),
        java.nio.file.Paths.get(root, k, "b=seed3"))
    }
    // the old bug: n derived from markers alone -> n=1... then a later
    // compact at n=3 collides with the orphan and throws forever. The
    // fix derives n past BOTH markers and live seed suffixes -> 4.
    DedupStream.compact(spark, root)
    assert(gens("bands") === Seq("b=seed4"))
    assert(gens("docs") === Seq("b=seed4"))
    // stale LEGACY marker pointing at the LIVE generation (e.g. a
    // re-seeded root): the target is NEWER than the marker, so the
    // legacy guard must refuse to delete it — and retire the marker as
    // spent
    val live = java.nio.file.Paths.get(root, "bands", "b=seed4")
    val staleMarker = java.nio.file.Paths.get(root, "commits", "compact-9")
    java.nio.file.Files.write(staleMarker, live.toString.getBytes("UTF-8"))
    staleMarker.toFile.setLastModified(
      live.toFile.lastModified() - 60000L)
    // and a RECORDED-mtime marker (the r18 protocol) whose target was
    // modified after supersede (a re-seed): recorded != current, so it
    // survives regardless of marker age — the protocol's live-data
    // guard is content-based, not tick-based
    val reseeded = java.nio.file.Paths.get(root, "docs", "b=seed4")
    val recMarker = java.nio.file.Paths.get(root, "commits", "compact-8")
    java.nio.file.Files.write(recMarker,
      s"${reseeded.toFile.lastModified() - 1}\t$reseeded".getBytes("UTF-8"))
    DedupStream.compact(spark, root) // single generation: fold no-ops,
                                     // but pending cleanup still runs
    assert(java.nio.file.Files.exists(live),
      "a live dir newer than the marker must survive cleanup")
    assert(!java.nio.file.Files.exists(staleMarker),
      "the spent marker must be retired")
    assert(java.nio.file.Files.exists(reseeded),
      "a dir modified after supersede (recorded mtime mismatch) must " +
        "survive cleanup")
    assert(!java.nio.file.Files.exists(recMarker),
      "the recorded-mtime marker must be retired after ceding the " +
        "modified dir")
    // the store still works end to end after all of the above
    DedupStream.processBatch(docs.filter(col("doc_id") % 10 === 4),
      root, 1L, autoCompactFraction = 0)
    assert(spark.read.parquet(s"$root/verdicts/b=1").count() > 0)
  }

  test("dedup ingest exactly-once: a committed batch re-delivered is a " +
       "no-op; a crash-torn batch replays whole") {
    import graft.streaming.DedupStream
    val root = java.nio.file.Files
      .createTempDirectory("dedup_once").resolve("store").toString
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    DedupStream.seed(spark, docs.filter(col("doc_id") % 10 < 5), root)
    val b0 = docs.filter(col("doc_id") % 10 === 5)
    DedupStream.processBatch(b0, root, 0L)
    val verdicts0 = spark.read.parquet(s"$root/verdicts/*").collect().toSet
    // per-generation counts: the seed is pb-partitioned, batch gens are
    // flat — a mixed glob won't partition-infer
    def bandCount(): Long = Seq("b=seed", "b=0")
      .map(g => spark.read.parquet(s"$root/bands/$g").count()).sum
    val bandRows0 = bandCount()
    // redelivery of the committed id: byte-identical store
    DedupStream.processBatch(b0, root, 0L)
    assert(spark.read.parquet(s"$root/verdicts/*").collect().toSet
      === verdicts0)
    assert(bandCount() === bandRows0)
    // crash window: batch 1 wrote verdicts+bands but died BEFORE the
    // commit marker — replay must clean the partials and rerun whole,
    // and the transiently-indexed own bands must not self-match
    val b1 = docs.filter(col("doc_id") % 10 === 6)
    graft.operators.Dedup.minhashBands(spark, b1)
      .write.parquet(s"$root/bands/b=1")
    b1.limit(3).write.parquet(s"$root/verdicts/b=1") // torn garbage
    DedupStream.processBatch(b1, root, 1L)
    val v1 = spark.read.parquet(s"$root/verdicts/b=1")
    assert(v1.columns.toSeq ===
      Seq("doc_id", "dup_of", "best_jaccard", "keep"))
    assert(v1.count() === b1.count())
    // no doc is its own dup (the a =!= b guard under replay)
    assert(v1.filter(col("dup_of") === col("doc_id")).count() === 0L)
    // index holds exactly one generation of batch-1 bands
    assert(spark.read.parquet(s"$root/bands/b=1").count() ===
      graft.operators.Dedup.minhashBands(spark, b1).count())
  }
}
