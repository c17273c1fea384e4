package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.exec.{CursorPager, ResultMaterializer}
import graft.exec.CursorPager.{Cursor, Start}
import graft.sql.QueryFacade

/** Specs for the system surfaces kept from the reference: SQL facade
  * (statement splitting + read_files rewrite), result materialization
  * (rec_N.parquet layout), and bidirectional cursor paging.
  */
class ExecSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("splitStatements: semicolons in strings/comments don't split") {
    val s = QueryFacade.splitStatements(
      "select ';' as x; -- trailing; comment\nselect 2;\n\nselect \";\"")
    assert(s === Seq("select ';' as x", "-- trailing; comment\nselect 2",
      "select \";\""))
  }

  test("read_files rewrite runs the reference demo query end-to-end") {
    // the reference's own demo: select * from read_files(...) where ...
    val df = QueryFacade.run(spark,
      s"select * from read_files('$dir/lineitem.parquet') " +
        "where l_quantity > 45.0")
    assert(df.count() ===
      spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_quantity") > 45.0).count())
  }

  test("catalog tables: bare `FROM tablename` SQL runs end-to-end") {
    // the reference parses a bare Table node (logical_planner.rs:392-395)
    // but errors NotImplemented at execution (builder.rs:67-72); here
    // registerAll completes it through the session catalog — including
    // the events table, whose TIMESTAMP(NANOS) column must surface as a
    // usable timestamp
    graft.sources.Tables.registerAll(spark, dir)
    val n = QueryFacade.run(spark,
      "select count(*) as n from lineitem where l_quantity > 45.0")
      .collect()(0).getLong(0)
    assert(n === spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 45.0).count())
    val d = QueryFacade.run(spark,
      "select min(date_trunc('DAY', ts)) as d from events")
      .collect()(0)
    assert(!d.isNullAt(0))
  }

  test("connections: fs root resolves end-to-end; s3 maps to s3a + conf") {
    import graft.sources.Connections
    // Fs connection: read_files resolves relative to the registered root
    Connections.register(spark, "local", Connections.Fs(dir))
    val df = QueryFacade.run(spark,
      "select count(*) as n from read_files('orders.parquet', " +
        "connection=>'local')")
    assert(df.collect()(0).getLong(0) === 1500L)
    // S3 connection: URI layout + per-bucket s3a settings (worker.rs:115-131)
    Connections.register(spark, "warehouse", Connections.S3(
      endpoint = "http://minio:9000", accessKeyId = "ak",
      secretAccessKey = "sk", bucket = "data", root = "lake/raw",
      region = "us-east-1", forcePathStyle = true))
    assert(Connections.resolve(spark, "warehouse", "events/*.parquet") ===
      "s3a://data/lake/raw/events/*.parquet")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.bucket.data.endpoint") === "http://minio:9000")
    assert(hc.get("fs.s3a.bucket.data.path.style.access") === "true")
    // legacy bare-scheme fallback and unknown-name error
    assert(Connections.resolve(spark, "s3", "b/k.parquet") ===
      "s3a://b/k.parquet")
    intercept[Connections.InvalidConnection] {
      Connections.resolve(spark, "nope", "x")
    }
    intercept[Connections.InvalidConnection] {
      Connections.register(spark, "", Connections.Fs("/tmp"))
    }
  }

  test("connections: rotate swaps a bucket's credentials; register still " +
       "refuses a conflicting clobber") {
    import graft.sources.Connections
    Connections.register(spark, "rotbucket", Connections.S3(
      endpoint = "http://minio:9000", accessKeyId = "ak1",
      secretAccessKey = "sk1", bucket = "rotb", root = "lake",
      region = "us-east-1", forcePathStyle = true))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.bucket.rotb.access.key") === "ak1")
    // a plain re-register with different credentials stays rejected —
    // rotation must be explicit, not a silent clobber
    intercept[Connections.InvalidConnection] {
      Connections.register(spark, "rotbucket2", Connections.S3(
        endpoint = "http://minio:9000", accessKeyId = "ak2",
        secretAccessKey = "sk2", bucket = "rotb", root = "lake",
        region = "us-east-1", forcePathStyle = true))
    }
    // the explicit rotation path applies the new credentials
    Connections.rotate(spark, "rotbucket", Connections.S3(
      endpoint = "http://minio:9000", accessKeyId = "ak2",
      secretAccessKey = "sk2", bucket = "rotb", root = "lake",
      region = "us-east-1", forcePathStyle = true))
    assert(hc.get("fs.s3a.bucket.rotb.access.key") === "ak2")
    assert(hc.get("fs.s3a.bucket.rotb.secret.key") === "sk2")
    // post-rotation, registering another name with the NEW credentials
    // agrees with the guard; the OLD ones are now the conflicting set
    Connections.register(spark, "rotbucket3", Connections.S3(
      endpoint = "http://minio:9000", accessKeyId = "ak2",
      secretAccessKey = "sk2", bucket = "rotb", root = "other",
      region = "us-east-1", forcePathStyle = true))
    intercept[Connections.InvalidConnection] {
      Connections.register(spark, "rotbucket4", Connections.S3(
        endpoint = "http://minio:9000", accessKeyId = "ak1",
        secretAccessKey = "sk1", bucket = "rotb", root = "lake",
        region = "us-east-1", forcePathStyle = true))
    }
    // rotation guards: unknown name, and bucket changes are not rotations
    intercept[Connections.InvalidConnection] {
      Connections.rotate(spark, "no-such-name", Connections.S3(
        endpoint = "e", accessKeyId = "a", secretAccessKey = "s",
        bucket = "rotb", root = "", region = "", forcePathStyle = false))
    }
    intercept[Connections.InvalidConnection] {
      Connections.rotate(spark, "rotbucket", Connections.S3(
        endpoint = "e", accessKeyId = "a", secretAccessKey = "s",
        bucket = "otherbucket", root = "", region = "",
        forcePathStyle = false))
    }
  }

  test("connections: rotate re-points sibling aliases on the same bucket, " +
       "each keeping its own root") {
    import graft.sources.Connections
    // test-unique bucket + full cleanup below: this test mutates
    // JVM-global state (registry entries and per-bucket fs.s3a.* Hadoop
    // conf), and leaving it behind would order-couple later tests that
    // register on the same bucket or enumerate connections
    val bucket = s"sibb${java.util.UUID.randomUUID().toString.take(8)}"
    def s3(ak: String, sk: String, root: String) = Connections.S3(
      endpoint = "http://minio:9000", accessKeyId = ak,
      secretAccessKey = sk, bucket = bucket, root = root,
      region = "us-east-1", forcePathStyle = true)
    try {
      // two aliases on one bucket (allowed: credentials match), own roots
      Connections.register(spark, "sib_raw", s3("akA", "skA", "lake/raw"))
      Connections.register(spark, "sib_cur", s3("akA", "skA", "lake/curated"))
      Connections.rotate(spark, "sib_raw", s3("akB", "skB", "lake/raw"))
      // the SIBLING alias must now carry the rotated credentials — the
      // Hadoop conf it reads through already did, so a stale registry
      // entry would hand back revoked keys — while its root survives
      Connections.get(spark, "sib_cur") match {
        case Some(s: Connections.S3) =>
          assert(s.accessKeyId === "akB")
          assert(s.secretAccessKey === "skB")
          assert(s.root === "lake/curated")
        case other => fail(s"sib_cur resolved to $other")
      }
      assert(Connections.resolve(spark, "sib_cur", "d/*.parquet") ===
        s"s3a://$bucket/lake/curated/d/*.parquet")
      // and a register with the PRE-rotation credentials now conflicts
      intercept[Connections.InvalidConnection] {
        Connections.register(spark, "sib_stale", s3("akA", "skA", "x"))
      }
    } finally {
      Seq("sib_raw", "sib_cur", "sib_stale")
        .foreach(Connections.unregister(spark, _))
      val hc = spark.sparkContext.hadoopConfiguration
      import scala.jdk.CollectionConverters._
      hc.iterator().asScala.map(_.getKey)
        .filter(_.startsWith(s"fs.s3a.bucket.$bucket.")).toList
        .foreach(hc.unset)
    }
  }

  test("object-store e2e (seam probe): against a configured S3-compatible " +
       "endpoint the Connections registry round-trips write + read + " +
       "rotate on a REAL bucket; without one, the capability note") {
    import graft.sources.Connections
    // The ffmpeg-seam device applied to object storage: probe the TWO
    // things the e2e needs — an s3a FileSystem implementation on the
    // classpath (hadoop-aws; absent in this container) and an endpoint
    // to talk to (env-configured) — and run the full round trip when
    // both are present. When either is missing the test CANCELS with
    // the capability note (assume), not a fake green: the conf-level
    // register/resolve/rotate behavior is covered unconditionally by
    // the tests above; this closes the last conf-level-only surface
    // wherever a MinIO/S3 endpoint exists.
    val hc = spark.sparkContext.hadoopConfiguration
    val s3aLoadable =
      try {
        org.apache.hadoop.fs.FileSystem.getFileSystemClass("s3a", hc)
        true
      } catch { case _: Throwable => false }
    val endpoint = sys.env.get("GRAFT_S3_TEST_ENDPOINT")
    assume(s3aLoadable && endpoint.nonEmpty,
      (if (!s3aLoadable)
        "no s3a FileSystem implementation on the classpath " +
          "(hadoop-aws is not in /opt/spark/jars in this container); "
      else "") +
        (if (endpoint.isEmpty)
          "no S3-compatible endpoint configured (set " +
            "GRAFT_S3_TEST_ENDPOINT / _ACCESS_KEY / _SECRET_KEY / " +
            "_BUCKET to run, e.g. against MinIO); "
        else "") +
        "conf-level connection behavior is covered by the tests above — " +
        "this e2e runs wherever the seam is present")
    val bucket = sys.env.getOrElse("GRAFT_S3_TEST_BUCKET", "graft-test")
    val conn = Connections.S3(
      endpoint = endpoint.get,
      accessKeyId = sys.env.getOrElse("GRAFT_S3_TEST_ACCESS_KEY", ""),
      secretAccessKey = sys.env.getOrElse("GRAFT_S3_TEST_SECRET_KEY", ""),
      bucket = bucket,
      root = s"e2e-${java.util.UUID.randomUUID().toString.take(8)}",
      region = sys.env.getOrElse("GRAFT_S3_TEST_REGION", ""),
      forcePathStyle = true)
    try {
      Connections.register(spark, "e2e_store", conn)
      // write THROUGH the resolved URI, read back through read_files
      val uri = Connections.resolve(spark, "e2e_store", "roundtrip.parquet")
      val src = spark.read.parquet(s"$dir/region.parquet")
      src.write.mode("overwrite").parquet(uri)
      val back = QueryFacade.run(spark,
        "select r_regionkey, r_name from " +
          "read_files('roundtrip.parquet', connection=>'e2e_store') " +
          "order by r_regionkey")
      assert(back.collect().map(_.getLong(0)).toSeq ===
        src.orderBy("r_regionkey").collect().map(_.getLong(0)).toSeq)
      // rotation against the live endpoint: same credentials re-applied
      // (a no-op rotation) must evict the cached client and keep reads
      // working — the cache-eviction path exercised for real
      Connections.rotate(spark, "e2e_store", conn)
      assert(QueryFacade.run(spark,
        "select count(*) as n from " +
          "read_files('roundtrip.parquet', connection=>'e2e_store')")
        .head.getLong(0) === src.count())
    } finally {
      Connections.unregister(spark, "e2e_store")
      import scala.jdk.CollectionConverters._
      hc.iterator().asScala.map(_.getKey)
        .filter(_.startsWith(s"fs.s3a.bucket.$bucket.")).toList
        .foreach(hc.unset)
    }
  }

  test("runScript: a created temp view referencing read_files survives") {
    val dfs = QueryFacade.runScript(spark,
      s"""-- nightly rollup view (comment must not hide the CREATE)
         create or replace temp view demo_v as
         select * from read_files('$dir/region.parquet');
         select count(*) as n from demo_v""")
    assert(dfs.last.collect()(0).getLong(0) === 5L)
    // re-analysis of the stored view text must still resolve
    assert(spark.sql("select * from demo_v").count() === 5L)
    spark.catalog.dropTempView("demo_v")
    // plain statements leave no ADDITIONAL graft_read_files_* views
    // behind (the CREATE VIEW statement's own is retained by design)
    def graftViews = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_read_files_")).toSet
    val before = graftViews
    QueryFacade.run(spark,
      s"select * from read_files('$dir/region.parquet')").count()
    assert(graftViews === before)
  }

  test("read_files detects csv/jsonl/orc from the glob extension") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = spark.read.parquet(s"$dir/region.parquet")
    src.coalesce(1).write.option("header", "true").csv(s"$tmp/csv")
    src.coalesce(1).write.json(s"$tmp/json")
    src.coalesce(1).write.orc(s"$tmp/orc")
    assert(QueryFacade.run(spark,
      s"select count(*) as n from read_files('$tmp/csv/*.csv')")
      .collect()(0).getLong(0) === 5L)
    assert(QueryFacade.run(spark,
      s"select count(*) as n from read_files('$tmp/json/*.json')")
      .collect()(0).getLong(0) === 5L)
    assert(QueryFacade.run(spark,
      s"select count(*) as n from read_files('$tmp/orc/*.orc')")
      .collect()(0).getLong(0) === 5L)
  }

  test("facade rejects multi-statement run()") {
    intercept[QueryFacade.MultipleStatements] {
      QueryFacade.run(spark, "select 1; select 2")
    }
    intercept[QueryFacade.EmptyQuery] { QueryFacade.run(spark, "  ;; ") }
  }

  test("materializer writes rec_N layout and reads footers") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .repartition(4)
    val rs = ResultMaterializer.materialize(df, tmp, "q-123")
    assert(rs.files.nonEmpty)
    assert(rs.files.forall(_.path.contains("rec_")))
    assert(rs.totalRows === 6000L)
    val reopened = ResultMaterializer.open(s"$tmp/q-123")
    assert(reopened.files.map(_.rowGroupRows) === rs.files.map(_.rowGroupRows))
  }

  test("cursor pager: forward pages reassemble the full result in order") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey").coalesce(2)
    val rs = ResultMaterializer.materialize(df, tmp, "q-fwd")
    val pager = new CursorPager(spark, rs)
    var cursor: Option[Cursor] = Some(Start)
    val got = Vector.newBuilder[Long]
    var pages = 0
    while (cursor.isDefined) {
      val p = pager.page(cursor.get, 137, forward = true)
      got ++= p.rows.map(_.getLong(0))
      assert(p.offsets.length === p.rows.length)
      cursor = p.next
      pages += 1
    }
    val all = got.result()
    assert(all.length === 1500)
    assert(pages === (1500 + 136) / 137)
    // global order = concatenation of the materialized files in rec order
    val direct = rs.files.flatMap(f =>
      spark.read.parquet(f.path).collect().map(_.getLong(0)))
    assert(all === direct)
  }

  test("arrow page: IPC bytes re-decode to exactly the Row page") {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.ListVector
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    // mixed-type page: integral, floating, string (with a null), boolean,
    // nested array — the Spark↔Arrow mapping must hold for all of them
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"),
        when(col("o_orderkey") % 7 =!= 0, col("o_orderpriority"))
          .as("prio_or_null"),
        (col("o_orderkey") % 2 === 0).as("even"),
        array(col("o_orderkey"), col("o_orderkey") * 2).as("arr"))
      .coalesce(2)
    val rs = ResultMaterializer.materialize(df, tmp, "q-arrow")
    val pager = new CursorPager(spark, rs)
    val rowPage = pager.page(Start, 97, forward = true)
    val arrowPage = pager.pageArrow(Start, 97, forward = true)
    // identical cursor bookkeeping
    assert(arrowPage.offsets === rowPage.offsets)
    assert(arrowPage.next === rowPage.next)
    // byte-level re-decode through a plain Arrow reader
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val rdr = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(arrowPage.ipc), alloc)
    try {
      assert(rdr.loadNextBatch())
      val root = rdr.getVectorSchemaRoot
      assert(root.getRowCount === rowPage.rows.length)
      assert(root.getSchema.getFields.size() === 5)
      val key = root.getVector("o_orderkey").asInstanceOf[BigIntVector]
      val price = root.getVector("price").asInstanceOf[Float8Vector]
      val prio = root.getVector("prio_or_null").asInstanceOf[VarCharVector]
      val even = root.getVector("even").asInstanceOf[BitVector]
      val arr = root.getVector("arr").asInstanceOf[ListVector]
      rowPage.rows.zipWithIndex.foreach { case (r, i) =>
        assert(key.get(i) === r.getLong(0))
        assert(price.get(i) === r.getDouble(1))
        if (r.isNullAt(2)) assert(prio.isNull(i))
        else assert(new String(prio.get(i), "UTF-8") === r.getString(2))
        assert((even.get(i) === 1) === r.getBoolean(3))
        val lst = arr.getObject(i)
        assert(lst.size() === 2)
        assert(lst.get(0).asInstanceOf[Long] === r.getSeq[Long](4)(0))
        assert(lst.get(1).asInstanceOf[Long] === r.getSeq[Long](4)(1))
      }
      assert(!rdr.loadNextBatch(), "expected exactly one batch per page")
    } finally { rdr.close(); alloc.close() }
  }

  test("sharded export: partitioned, size-capped, deterministic; " +
       "per-partition counts ride a job into the _stats sidecar " +
       "(ExportStats is O(1) — no driver-side collect of counts)") {
    import graft.exec.ShardedExport
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val stats = ShardedExport.exportCurated(spark, dir, out,
      maxRecordsPerFile = 50L)
    // every kept doc arrived, partitioned by lang
    val kept = graft.operators.TextOps.textQuality(spark, dir)
      .filter(col("keep")).count()
    assert(stats.rows === kept)
    // the receipt itself is bounded: counts live in the sidecar, read
    // back as a frame — and equal a recomputed groupBy over the
    // committed files, partition for partition
    val side = ShardedExport.readStats(spark, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val recomputed = spark.read.parquet(out)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(side === recomputed)
    assert(side.keys.nonEmpty && side.size > 1)
    assert(side.values.sum === kept)
    // the per-file cap held: no parquet file exceeds 50 rows (data
    // shards only — the _stats sidecar is a receipt, not a shard)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains(s"/${ShardedExport.StatsDir}/"))
      .iterator()
    var checked = 0
    while (files.hasNext) {
      val f = files.next()
      assert(spark.read.parquet(f.toString).count() <= 50L, f.toString)
      checked += 1
    }
    assert(checked.toLong === stats.files && stats.files > 1L)
    // re-export is deterministic: same receipt, same sidecar counts
    val again = ShardedExport.exportCurated(spark, dir, out,
      maxRecordsPerFile = 50L)
    assert(again === stats)
    val sideAgain = ShardedExport.readStats(spark, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sideAgain === side)
  }

  test("arrow page: empty result set pages as an empty IPC stream") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") < 0).select("o_orderkey")
    val rs = ResultMaterializer.materialize(df, tmp, "q-empty")
    val pager = new CursorPager(spark, rs)
    val p = pager.pageArrow(Start, 10)
    assert(p.offsets.isEmpty && p.next.isEmpty)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(p.ipc), alloc)
    try {
      assert(rdr.loadNextBatch())
      assert(rdr.getVectorSchemaRoot.getRowCount === 0)
    } finally { rdr.close(); alloc.close() }
  }

  test("cursor pager: backward then forward round-trips") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey").coalesce(3)
    val rs = ResultMaterializer.materialize(df, tmp, "q-rev")
    val pager = new CursorPager(spark, rs)
    // jump to the middle, page back (cursor-INCLUSIVE, the reference's
    // iterator protocol), then forward from the page's first offset
    val mid = pager.toCursor(700L)
    val back = pager.page(mid, 100, forward = false)
    assert(back.rows.length === 100)
    assert(pager.toGlobal(back.offsets.head) === 601L)
    assert(pager.toGlobal(back.offsets.last) === 700L)
    // next reverse cursor = row before the page, like get_next_offset
    assert(pager.toGlobal(back.next.get) === 600L)
    val fwd = pager.page(back.offsets.head, 100, forward = true)
    assert(fwd.rows.map(_.getLong(0)) === back.rows.map(_.getLong(0)))
    // boundary: backward from Start serves exactly row 0 and terminates
    val atStart = pager.page(Start, 10, forward = false)
    assert(atStart.rows.length === 1 && atStart.next.isEmpty)
    val tail = pager.page(pager.toCursor(1490L), 100, forward = true)
    assert(tail.rows.length === 10 && tail.next.isEmpty)
  }

  test("cursor pager: reverse iteration reassembles the result backwards") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey").coalesce(3)
    val rs = ResultMaterializer.materialize(df, tmp, "q-rev2")
    val pager = new CursorPager(spark, rs)
    var cursor: Option[Cursor] = Some(pager.toCursor(pager.totalRows - 1))
    val pages = Vector.newBuilder[Seq[Long]]
    while (cursor.isDefined) {
      val p = pager.page(cursor.get, 137, forward = false)
      pages += p.rows.map(_.getLong(0))
      cursor = p.next
    }
    val reassembled = pages.result().reverse.flatten
    val direct = rs.files.flatMap(f =>
      spark.read.parquet(f.path).collect().map(_.getLong(0))).toSeq
    assert(reassembled === direct)
  }

  test("cursor pager: allow_overflow tops up a clamped reverse page") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey").coalesce(3)
    val rs = ResultMaterializer.materialize(df, tmp, "q-ovf")
    val pager = new CursorPager(spark, rs)
    val c5 = pager.toCursor(5L)
    // without the flag: the partial page [0..5] as-is
    val plain = pager.page(c5, 10, forward = false)
    assert(plain.rows.length === 6)
    assert(plain.offsets.map(pager.toGlobal) === (0L to 5L))
    assert(plain.next.isEmpty)
    // with the flag: wraps forward past the cursor to fill the page
    val over = pager.page(c5, 10, forward = false, allowOverflow = true)
    assert(over.rows.length === 10)
    assert(over.offsets.map(pager.toGlobal) === (0L to 9L))
    assert(over.next.isEmpty)
    assert(over.rows.map(_.getLong(0)) ===
      pager.page(Start, 10, forward = true).rows.map(_.getLong(0)))
    // a non-clamped reverse page is unaffected by the flag
    val mid = pager.toCursor(700L)
    assert(pager.page(mid, 100, forward = false, allowOverflow = true)
      .offsets.map(pager.toGlobal) ===
      pager.page(mid, 100, forward = false).offsets.map(pager.toGlobal))
    // overflow cannot run past the end of data
    val nearAll = pager.page(pager.toCursor(2L), 5000, forward = false,
      allowOverflow = true)
    assert(nearAll.rows.length === 1500)
  }

  test("async lifecycle: submit -> poll -> page; errors and unknown ids") {
    import graft.exec.AsyncQueryRunner
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    val id = runner.submit(
      s"select o_orderkey from read_files('$dir/orders.parquet') " +
        "order by o_orderkey")
    // submit returned immediately with a pollable id
    assert(runner.status(id) !== AsyncQueryRunner.QueryNotFound)
    val fin = runner.waitForFinish(id, maxWaitMs = 120000L)
    assert(fin.isInstanceOf[AsyncQueryRunner.Complete], s"got $fin")
    val pager = runner.results(id)
    assert(pager.totalRows === 1500L)
    assert(pager.page(Start, 5).rows.map(_.getLong(0)).nonEmpty)
    // a failing statement lands in Error, not an exception on submit
    val bad = runner.submit("select * from read_files('/nonexistent-glob')")
    val badFin = runner.waitForFinish(bad, maxWaitMs = 120000L)
    assert(badFin.isInstanceOf[AsyncQueryRunner.Error], s"got $badFin")
    intercept[IllegalStateException] { runner.results(bad) }
    // unknown ids: QueryNotFound, a terminal status (wait returns at once)
    assert(runner.status("nope") === AsyncQueryRunner.QueryNotFound)
    assert(runner.waitForFinish("nope") === AsyncQueryRunner.QueryNotFound)
    // forget drops bookkeeping (and optionally the result files)
    runner.forget(id, deleteFiles = true)
    assert(runner.status(id) === AsyncQueryRunner.QueryNotFound)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tmp, id)))
  }

  test("async lifecycle: concurrent submits don't cross-read tables") {
    import graft.exec.AsyncQueryRunner
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    // different tables with different row counts, submitted concurrently
    // on ONE session — the rewritten read_files views must not collide
    val expected = Map("region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "orders" -> 1500L)
    val ids = expected.keys.toSeq.map { t =>
      t -> runner.submit(s"select * from read_files('$dir/$t.parquet')")
    }
    ids.foreach { case (t, id) =>
      val fin = runner.waitForFinish(id, maxWaitMs = 120000L)
      assert(fin.isInstanceOf[AsyncQueryRunner.Complete], s"$t: $fin")
      assert(runner.results(id).totalRows === expected(t), s"table $t")
      runner.forget(id, deleteFiles = true)
    }
  }

  test("sweepOrphans: a crash-orphaned result dir is TTL-swept; live " +
       "dirs and fresh orphans survive") {
    import graft.exec.AsyncQueryRunner
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    // a live completed query — tracked in the state map, never sweepable
    val live = runner.submit(
      s"select r_regionkey from read_files('$dir/region.parquet')")
    assert(runner.waitForFinish(live, maxWaitMs = 120000L)
      .isInstanceOf[AsyncQueryRunner.Complete])
    val livePath = java.nio.file.Paths.get(tmp, live)
    assert(java.nio.file.Files.isDirectory(livePath))
    // crash simulation: a result dir from a previous JVM — on disk with
    // files, but unknown to this runner's in-memory state
    val ghost = java.util.UUID.randomUUID().toString
    val ghostPath = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(tmp, ghost))
    java.nio.file.Files.writeString(
      ghostPath.resolve("rec_0.parquet"), "stale")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600_000L)
    java.nio.file.Files.setLastModifiedTime(ghostPath, old)
    // a FRESH orphan (another runner may be mid-materialize): inside TTL
    val fresh = java.util.UUID.randomUUID().toString
    val freshPath = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(tmp, fresh))
    // sweep with a 10-minute TTL: only the stale ghost goes
    val removed = runner.sweepOrphans(ttlMs = 600_000L)
    assert(removed === Seq(ghost))
    assert(!java.nio.file.Files.exists(ghostPath))
    assert(java.nio.file.Files.isDirectory(livePath)) // live untouched
    assert(java.nio.file.Files.isDirectory(freshPath)) // inside TTL
    // the live query's results still page after the sweep
    assert(runner.results(live).totalRows === 5L)
    // age the fresh orphan past the TTL: next sweep takes it
    java.nio.file.Files.setLastModifiedTime(freshPath, old)
    assert(runner.sweepOrphans(ttlMs = 600_000L) === Seq(fresh))
    // maxDeletes bounds one sweep's work
    val ghosts = (1 to 3).map { _ =>
      val g = java.util.UUID.randomUUID().toString
      val p = java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(tmp, g))
      java.nio.file.Files.setLastModifiedTime(p, old)
      g
    }
    assert(runner.sweepOrphans(ttlMs = 600_000L, maxDeletes = 2).size === 2)
    assert(runner.sweepOrphans(ttlMs = 600_000L).size === 1)
    assert(ghosts.forall(g =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(tmp, g))))
  }

  test("async concurrency audit: pooled submits with a mid-flight cancel, " +
       "5 rounds — views, result dirs, and states stay isolated") {
    import graft.exec.AsyncQueryRunner
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    // a per-row sleep makes the cancel victim deterministically slow
    // enough to be caught mid-flight (tasks interrupt on cancel)
    spark.udf.register("graft_test_sleep", (ms: Int, x: Long) => {
      Thread.sleep(ms.toLong); x
    })
    val expected = Map("region" -> 5L, "nation" -> 25L, "supplier" -> 10L,
      "customer" -> 150L, "orders" -> 1500L)
    // a CREATE VIEW statement legitimately KEEPS its rewritten views
    // (stored-text re-resolution — the runScript spec makes one), so the
    // leak check is against a baseline snapshot, not absolute emptiness
    def readFilesViews(): Set[String] = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_read_files_")).toSet
    val preExisting = readFilesViews()
    for (round <- 1 to 5) {
      // concurrent submits routed across two scheduler pools (inert
      // under the test context's FIFO mode, but the property must be
      // thread-local per query and cleared on thread reuse — 5 rounds
      // over a cached pool exercise exactly that)
      val ids = expected.keys.toSeq.zipWithIndex.map { case (t, i) =>
        t -> runner.submit(s"select * from read_files('$dir/$t.parquet')",
          incremental = i % 2 == 0,
          schedulerPool = Some(s"pool${i % 2}"))
      }
      val victim = runner.submit(
        s"select graft_test_sleep(40, o_orderkey) as k " +
          s"from read_files('$dir/orders.parquet')",
        schedulerPool = Some("pool1"))
      runner.cancel(victim)
      // the cancel must land terminal as an error, never Complete
      val vFin = runner.waitForFinish(victim, maxWaitMs = 120000L)
      assert(vFin.isInstanceOf[AsyncQueryRunner.Error],
        s"round $round victim: $vFin")
      // ...and must not have bled into any concurrent query
      ids.foreach { case (t, id) =>
        val fin = runner.waitForFinish(id, maxWaitMs = 120000L)
        assert(fin.isInstanceOf[AsyncQueryRunner.Complete],
          s"round $round $t: $fin")
        assert(runner.results(id).totalRows === expected(t),
          s"round $round $t")
        // per-query result dir exists and is its own
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(tmp, id)), s"round $round $t dir")
      }
      // no rewritten read_files view may leak into the shared session
      val leaked = readFilesViews() -- preExisting
      assert(leaked.isEmpty, s"round $round leaked views: $leaked")
      (ids.map(_._2) :+ victim).foreach(runner.forget(_, deleteFiles = true))
      ids.foreach { case (_, id) =>
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(tmp, id)))
      }
    }
  }

  test("parquet range reader: page parity with the Spark read path, " +
       "multi-row-group files, arrow bytes, and the fallback seam") {
    import graft.exec.ParquetRangeReader
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    // every type the range reader covers, including INT96 timestamps
    // (Spark's default parquet encoding), dates, and a nullable column
    val df = spark.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), // TIMESTAMP_NTZ under Spark 4's inference
        col("o_orderdate").cast("timestamp").as("o_ts"), // INT96 on write
        to_date(col("o_orderdate")).as("o_date"),
        when(col("o_orderkey") % 7 === 0, col("o_orderstatus"))
          .as("maybe_null"),
        (col("o_orderkey") % 2 === 0).as("flag"),
        col("o_orderkey").cast("int").as("ik"),
        col("o_totalprice").cast("float").as("fv"))
      .orderBy("o_orderkey")
    val rs = ResultMaterializer.materializeIncremental(df, tmp, "q-parity",
      rowsPerFile = 400)
    assert(ParquetRangeReader.supports(df.schema))
    def walkParity(rset: ResultMaterializer.ResultSet): Unit = {
      val ranged = new CursorPager(spark, rset)
      val viaSpark = new CursorPager(spark, rset, forceSparkReads = true)
      var c: Option[Cursor] = Some(Start)
      var pages = 0
      while (c.isDefined) {
        val a = ranged.page(c.get, 317)
        val b = viaSpark.page(c.get, 317)
        assert(a.rows === b.rows, s"page $pages rows")
        assert(a.offsets === b.offsets, s"page $pages offsets")
        assert(a.next === b.next, s"page $pages next")
        // the serving wire format must agree BYTE-FOR-BYTE
        assert(java.util.Arrays.equals(
          ranged.pageArrow(c.get, 317).ipc,
          viaSpark.pageArrow(c.get, 317).ipc), s"page $pages arrow bytes")
        c = a.next
        pages += 1
      }
      assert(pages > 1)
      // reverse with overflow exercises the backward group walk
      val last = ranged.toCursor(ranged.totalRows - 1)
      val ra = ranged.page(last, 97, forward = false, allowOverflow = true)
      val rb = viaSpark.page(last, 97, forward = false, allowOverflow = true)
      assert(ra.rows === rb.rows && ra.next === rb.next)
    }
    walkParity(rs)

    // a file with MULTIPLE row groups (tiny writer block size): each
    // page read must fetch single groups and still agree
    val mdir = java.nio.file.Files.createTempDirectory("results_mrg")
    df.coalesce(1).write.option("parquet.block.size", "16384")
      .option("parquet.page.size", "4096")
      .mode("overwrite").parquet(s"$mdir/w")
    val part = new java.io.File(s"$mdir/w").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, mdir.resolve("rec_0.parquet"))
    val mrs = ResultMaterializer.open(mdir.toString)
    assert(mrs.files.head.rowGroupRows.length > 1,
      s"block-size option ignored: ${mrs.files.head.rowGroupRows}")
    walkParity(mrs)

    // unsupported schema (array column) routes to the Spark path and
    // still serves
    val arrDf = spark.range(0, 100).select(col("id"),
      array(col("id"), col("id") + 1).as("arr"))
    assert(!ParquetRangeReader.supports(arrDf.schema))
    val ars = ResultMaterializer.materialize(arrDf, tmp, "q-arr")
    val apager = new CursorPager(spark, ars)
    assert(apager.totalRows === 100L)
    assert(apager.page(Start, 10).rows.length === 10)
  }

  test("parquet range reader: LEGACY-rebased pre-Gregorian timestamps " +
       "and dates match Spark's read exactly") {
    // Spark writes hybrid-Julian-rebased values when the write rebase
    // mode is LEGACY and marks the footer; the ranged reader must honor
    // those markers or pre-1582 values diverge by the calendar gap
    val mdir = java.nio.file.Files.createTempDirectory("results_legacy")
    val confs = Seq("spark.sql.parquet.int96RebaseModeInWrite",
      "spark.sql.parquet.datetimeRebaseModeInWrite",
      "spark.sql.parquet.outputTimestampType")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.parquet.int96RebaseModeInWrite", "LEGACY")
      spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "LEGACY")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      val df = spark.sql(
        """select * from values
             (1, timestamp'1001-03-05 12:34:56', date'1001-03-05'),
             (2, timestamp'1500-12-31 23:59:59', date'1500-12-31'),
             (3, timestamp'1582-10-04 00:00:00', date'1582-10-04'),
             (4, timestamp'2020-06-15 06:30:00', date'2020-06-15')
           as t(id, ts, d)""")
      df.coalesce(1).write.mode("overwrite").parquet(s"$mdir/w96")
      val part = new java.io.File(s"$mdir/w96").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, mdir.resolve("rec_0.parquet"))
      val rs = ResultMaterializer.open(mdir.toString)
      val ranged = new CursorPager(spark, rs)
      val viaSpark = new CursorPager(spark, rs, forceSparkReads = true)
      val a = ranged.page(Start, 10)
      val b = viaSpark.page(Start, 10)
      assert(a.rows === b.rows)
      // and both agree with the ORIGINAL in-memory values
      assert(a.rows.map(_.getTimestamp(1).toString).toSet ===
        df.collect().map(_.getTimestamp(1).toString).toSet)
      assert(java.util.Arrays.equals(ranged.pageArrow(Start, 10).ipc,
        viaSpark.pageArrow(Start, 10).ipc))

      // same property for INT64-micros timestamps under datetime LEGACY
      spark.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
      val m2 = java.nio.file.Files.createTempDirectory("results_legacy64")
      df.coalesce(1).write.mode("overwrite").parquet(s"$m2/w64")
      val p2 = new java.io.File(s"$m2/w64").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(p2.toPath, m2.resolve("rec_0.parquet"))
      val rs2 = ResultMaterializer.open(m2.toString)
      val a2 = new CursorPager(spark, rs2).page(Start, 10)
      val b2 = new CursorPager(spark, rs2, forceSparkReads = true)
        .page(Start, 10)
      assert(a2.rows === b2.rows)

      // CORRECTED (proleptic) files exercise the opposite branch: the
      // ranged reader must Gregorian->Julian rebase pre-1582 micros to
      // match the hybrid-calendar java.sql.Timestamp Spark collects
      spark.conf.set("spark.sql.parquet.int96RebaseModeInWrite",
        "CORRECTED")
      spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite",
        "CORRECTED")
      for (ttype <- Seq("INT96", "TIMESTAMP_MICROS")) {
        spark.conf.set("spark.sql.parquet.outputTimestampType", ttype)
        val m3 = java.nio.file.Files.createTempDirectory(s"results_c$ttype")
        df.coalesce(1).write.mode("overwrite").parquet(s"$m3/w")
        val p3 = new java.io.File(s"$m3/w").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(p3.toPath, m3.resolve("rec_0.parquet"))
        val rs3 = ResultMaterializer.open(m3.toString)
        val a3 = new CursorPager(spark, rs3).page(Start, 10)
        val b3 = new CursorPager(spark, rs3, forceSparkReads = true)
          .page(Start, 10)
        assert(a3.rows === b3.rows, s"CORRECTED $ttype")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("query metrics: scan/shuffle totals read exactly from the " +
       "executed plan, through AQE stages") {
    import graft.exec.QueryMetrics
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    // a grouped query: one full scan + a shuffle whose record count is
    // the map-side-combined group count, all knowable in advance
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"))
    val m = QueryMetrics.profile(df)
    assert(m.scanRows === n, s"scanRows ${m.scanRows} != $n")
    assert(m.filesRead >= 1)
    // partial aggregation means far fewer shuffle records than rows,
    // but at least one per (group, input partition)
    assert(m.shuffleRecordsWritten >= 4 && m.shuffleRecordsWritten < n,
      s"shuffleRecords ${m.shuffleRecordsWritten}")
    assert(m.shuffleBytesWritten > 0L)
    assert(m.durationMs >= 0L)
    // a scan-only query shuffles nothing
    val m2 = QueryMetrics.profile(
      spark.read.parquet(s"$dir/region.parquet"))
    assert(m2.scanRows === 5L)
    assert(m2.shuffleRecordsWritten === 0L)
  }

  test("incremental materialize: pages are servable after each commit") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey")
    val served = Vector.newBuilder[Long]
    // After EVERY committed file, a pager over the directory as it exists
    // at that moment must serve all rows committed so far — this is the
    // serve-while-materializing contract, asserted deterministically at
    // each commit point instead of racing the writer.
    val rs = ResultMaterializer.materializeIncremental(df, tmp, "q-inc",
      rowsPerFile = 400, onFile = _ => {
        val snapshot = ResultMaterializer.open(
          java.nio.file.Paths.get(tmp, "q-inc").toString)
        val pager = new CursorPager(spark, snapshot)
        served += pager.totalRows
        assert(pager.page(Start, 10).rows.length === 10)
      })
    assert(rs.files.length === 4) // 1500 rows / 400 per file
    assert(rs.totalRows === 1500L)
    assert(served.result() === Vector(400L, 800L, 1200L, 1500L))
    // the final directory reads back identically to bulk materialization
    val all = new CursorPager(spark, rs)
    var cursor: Option[Cursor] = Some(Start)
    val ids = Vector.newBuilder[Long]
    while (cursor.isDefined) {
      val p = all.page(cursor.get, 333)
      ids ++= p.rows.map(_.getLong(0))
      cursor = p.next
    }
    assert(ids.result() ===
      spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
        .collect().map(_.getLong(0)).toVector)
  }

  test("compaction: merges small rec files, preserves order, idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey")
    // 15 small files of 100 rows each
    val rs0 = ResultMaterializer.materializeIncremental(df, tmp, "q-cmp",
      rowsPerFile = 100)
    assert(rs0.files.length === 15)
    val dirPath = java.nio.file.Paths.get(tmp, "q-cmp").toString
    val rs1 = ResultMaterializer.compact(spark, dirPath, minRowsPerFile = 400L)
    assert(rs1.files.length === 4)
    assert(rs1.files.map(_.rows) === Vector(400L, 400L, 400L, 300L))
    assert(rs1.totalRows === 1500L)
    // order preserved end-to-end
    val pager = new CursorPager(spark, rs1)
    var cursor: Option[Cursor] = Some(Start)
    val ids = Vector.newBuilder[Long]
    while (cursor.isDefined) {
      val p = pager.page(cursor.get, 500)
      ids ++= p.rows.map(_.getLong(0))
      cursor = p.next
    }
    assert(ids.result() === df.collect().map(_.getLong(0)).toVector)
    // second pass is a no-op
    val rs2 = ResultMaterializer.compact(spark, dirPath, minRowsPerFile = 400L)
    assert(rs2.files.map(_.rows) === rs1.files.map(_.rows))
  }

  test("compaction: interrupted commit is replayed by open()") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey")
    ResultMaterializer.materializeIncremental(df, tmp, "q-crash",
      rowsPerFile = 100)
    val d = java.nio.file.Paths.get(tmp, "q-crash")
    // simulate a crash immediately after the marker commit: stage the
    // .new set by running a real compact, then restore a pre-commit-tail
    // snapshot (marker + .new + stale originals)
    import scala.jdk.CollectionConverters._
    val origs = java.nio.file.Files.list(d).iterator().asScala.toVector
    val snap = java.nio.file.Files.createTempDirectory("snap")
    origs.foreach(p => java.nio.file.Files.copy(p, snap.resolve(p.getFileName)))
    ResultMaterializer.compact(spark, d.toString, minRowsPerFile = 400L)
    // rebuild the crash state: compacted outputs renamed back to .new,
    // stale originals restored, marker present
    java.nio.file.Files.list(d).iterator().asScala.toVector.foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("rec_") && n.endsWith(".parquet"))
        java.nio.file.Files.move(p, d.resolve(s"$n.new"))
    }
    origs.foreach(p => java.nio.file.Files.copy(snap.resolve(p.getFileName),
      d.resolve(p.getFileName)))
    java.nio.file.Files.write(d.resolve(".compacting"), "4".getBytes)
    // open() must finish the commit and serve the compacted layout
    val recovered = ResultMaterializer.open(d.toString)
    assert(recovered.files.length === 4)
    assert(recovered.totalRows === 1500L)
    assert(!java.nio.file.Files.exists(d.resolve(".compacting")))
  }

  test("cursor round-trip: toCursor ∘ toGlobal = identity on all rows") {
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/supplier.parquet").coalesce(1)
    val rs = ResultMaterializer.materialize(df, tmp, "q-id")
    val pager = new CursorPager(spark, rs)
    (0L until pager.totalRows).foreach { g =>
      assert(pager.toGlobal(pager.toCursor(g)) === g)
    }
  }

  test("property: reverse-of-forward returns the origin offsets for " +
       "random (limit, cursor) sequences (seeded scalacheck)") {
    import org.scalacheck.{Gen, rng}
    // SURVEY §7.5's forward∘reverse identity, as a property rather than
    // the two fixed-direction cases above: for ANY cursor and ANY limit,
    // a forward page followed by a reverse page anchored at the forward
    // page's last offset serves exactly the same offsets and rows —
    // and a whole random-limit reverse WALK retraces a random-limit
    // forward walk's coverage exactly.
    val tmp = java.nio.file.Files.createTempDirectory("results").toString
    val df = spark.read.parquet(s"$dir/orders.parquet").orderBy("o_orderkey")
      .select("o_orderkey").repartition(3)
    val rs = ResultMaterializer.materialize(df, tmp, "q-prop")
    val pager = new CursorPager(spark, rs)
    val n = pager.totalRows
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, rng.Seed(seed)).get
    val genStart = Gen.chooseNum(0L, n - 1)
    val genLimit = Gen.chooseNum(1, 400)
    // single-page identity at random (cursor, limit)
    (1 to 80).foreach { i =>
      val g0 = sample(genStart, i.toLong)
      val lim = sample(genLimit, 100000L + i)
      val fwd = pager.page(pager.toCursor(g0), lim, forward = true)
      assert(fwd.offsets.nonEmpty)
      val rev = pager.page(fwd.offsets.last, lim, forward = false)
      // the reverse page ends AT the anchor inclusive and is contiguous;
      // when the forward page was full it is EXACTLY the forward page
      val gEnd = pager.toGlobal(fwd.offsets.last) + 1
      assert(rev.offsets.map(pager.toGlobal) ===
        (math.max(gEnd - lim, 0L) until gEnd))
      if (fwd.offsets.length == lim) {
        assert(rev.offsets === fwd.offsets)
        assert(rev.rows.map(_.getLong(0)) === fwd.rows.map(_.getLong(0)))
      }
      // next cursors continue contiguously in each direction
      fwd.next.foreach(c => assert(pager.toGlobal(c) === g0 + fwd.rows.length))
      rev.next.foreach(c =>
        assert(pager.toGlobal(c) === math.max(gEnd - lim, 0L) - 1))
    }
    // walk identity: forward to the end with random limits, then reverse
    // from the last offset with a DIFFERENT random limit sequence — the
    // reverse walk must retrace [0, n) exactly, in reverse page order
    (1 to 8).foreach { w =>
      var cursor: Option[Cursor] = Some(Start)
      val fwdSeen = Vector.newBuilder[Long]
      var step = 0
      var lastOffset: Cursor = Start
      while (cursor.isDefined) {
        val p = pager.page(cursor.get,
          sample(genLimit, w * 10000L + step), forward = true)
        fwdSeen ++= p.offsets.map(pager.toGlobal)
        lastOffset = p.offsets.last
        cursor = p.next
        step += 1
      }
      assert(fwdSeen.result() === (0L until n))
      var rc: Option[Cursor] = Some(lastOffset)
      val revSeen = Vector.newBuilder[Long]
      while (rc.isDefined) {
        val p = pager.page(rc.get,
          sample(genLimit, w * 20000L + step), forward = false)
        // pages arrive back-to-front; rows within a page stay forward
        revSeen ++= p.offsets.map(pager.toGlobal).reverse
        rc = p.next
        step += 1
      }
      assert(revSeen.result().reverse === (0L until n))
    }
  }

  test("Partitioning: shuffle width derives from input bytes — inert at " +
       "test-SF sizes, scales for a big corpus, never ratchets") {
    import graft.engine.Partitioning
    val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // a test-SF-sized dir derives the base width — the inert fixed point
    assert(Partitioning.partitionsFor(spark, dir) === base)
    // a "big" corpus faked with a sparse file: getContentSummary counts
    // logical length, so a 2 GiB set costs no disk
    val tmp = java.nio.file.Files.createTempDirectory("ptune")
    val f = new java.io.RandomAccessFile(
      tmp.resolve("big.parquet").toFile, "rw")
    try f.setLength(2L << 30) finally f.close()
    val big = tmp.toString
    assert(Partitioning.inputBytes(spark, big) === (2L << 30))
    val expect = math.min(Partitioning.MaxPartitions.toLong, math.max(
      base.toLong, (2L << 30) / Partitioning.TargetBytesPerPartition)).toInt
    assert(Partitioning.partitionsFor(spark, big) === expect)
    assert(expect > base, "the faked corpus must exceed the base width")
    try {
      val n = Partitioning.autoTune(spark, big)
      assert(n === expect)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt === n)
      assert(spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        .toInt === n)
      // no ratchet: tuning back for the small corpus returns to the
      // session's BASE width, not the inflated one
      assert(Partitioning.autoTune(spark, dir) === base)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt === base)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", base.toString)
      spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      java.nio.file.Files.deleteIfExists(tmp.resolve("big.parquet"))
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}
