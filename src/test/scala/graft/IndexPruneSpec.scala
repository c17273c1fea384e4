package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.QueryMetrics
import graft.operators.Dedup

/** Bucket-pruned reads of the persisted incremental-index artifacts —
  * the round-16 fix for the measured StreamDedupBench scan floor
  * (SCALING.md: per-batch ingest cost grew +38% for a 100x index, all
  * of it the unpruned artifact scan).
  *
  * Pins, with EXECUTED-plan scan metrics (the LayoutSpec z-order
  * device):
  *  1. the pb partition filter really prunes — a batch-sized probe
  *     reads strictly fewer FILES and rows than the full artifact;
  *  2. pruning is lossless — the (band, bh) candidate join returns the
  *     identical pair set against the pruned and the full index (pb is
  *     a pure function of the join key, so the pruned read is a
  *     superset of every possible match);
  *  3. the sidecar protocol round-trips, and a legacy unpartitioned
  *     layout falls back to the full scan.
  */
class IndexPruneSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  private lazy val docs =
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

  test("pb-partitioned band index: batch probe reads fewer files AND " +
       "rows than the full artifact — executed-plan metrics") {
    val tmp = java.nio.file.Files.createTempDirectory("pbprune")
      .resolve("idx").toString
    // force a bucket count far above the probe's key count so pruning
    // is certain even at sf0.001 (production sizing does the same:
    // buckets outgrow batch keys as the corpus grows)
    val p = 64
    Dedup.writePartitionedBands(
      Dedup.minhashBands(spark, docs), tmp, p)
    assert(Dedup.indexBuckets(tmp) === Some(p))
    // a genuinely batch-sized probe: 3 documents -> <= 3 x Bands keys
    val probe = Dedup.minhashBands(spark, docs.limit(3)).persist()
    try {
      probe.count()
      val pruned = QueryMetrics.profile(
        Dedup.readBandIndexPruned(spark, tmp, probe))
      val full = QueryMetrics.profile(
        spark.read.parquet(tmp).drop("pb"))
      assert(pruned.filesRead < full.filesRead,
        s"pruning read ${pruned.filesRead} of ${full.filesRead} files")
      assert(pruned.filesRead <= 3L * Dedup.Bands)
      assert(pruned.scanRows < full.scanRows)
      info(s"files ${pruned.filesRead}/${full.filesRead}, " +
        s"rows ${pruned.scanRows}/${full.scanRows}")
    } finally probe.unpersist()
  }

  test("pruning is lossless: candidate (band, bh) join identical " +
       "against pruned and full index") {
    val tmp = java.nio.file.Files.createTempDirectory("pbloss")
      .resolve("idx").toString
    Dedup.writePartitionedBands(
      Dedup.minhashBands(spark, docs), tmp, 64)
    // probe chosen to carry REAL matches: the corpus's own first docs
    val probe = Dedup.minhashBands(spark, docs.limit(5)).persist()
    try {
      probe.count()
      def pairs(index: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        probe.as("d").join(index.as("c"),
            col("d.band") === col("c.band") && col("d.bh") === col("c.bh"))
          .select(col("d.doc_id"), col("c.doc_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaPruned = pairs(Dedup.readBandIndexPruned(spark, tmp, probe))
      val viaFull = pairs(spark.read.parquet(tmp).drop("pb"))
      assert(viaPruned.nonEmpty, "degenerate: no candidates at all")
      assert(viaPruned === viaFull)
    } finally probe.unpersist()
  }

  test("dd-partitioned partner store: a candidate-sized id set reads " +
       "fewer files AND rows than the full store, losslessly") {
    val tmp = java.nio.file.Files.createTempDirectory("ddprune")
      .resolve("docs").toString
    val p = 64
    Dedup.writePartitionedDocs(docs, tmp, p)
    assert(Dedup.indexBuckets(tmp) === Some(p))
    val ids = docs.limit(7).select(col("doc_id")).persist()
    try {
      ids.count()
      val pruned = QueryMetrics.profile(
        Dedup.readDocsPruned(spark, tmp, ids, docs))
      val full = QueryMetrics.profile(spark.read.parquet(tmp).drop("dd"))
      assert(pruned.filesRead < full.filesRead,
        s"pruning read ${pruned.filesRead} of ${full.filesRead} files")
      assert(pruned.filesRead <= 7L)
      assert(pruned.scanRows < full.scanRows)
      // lossless: every requested id's text is present and correct
      val got = Dedup.readDocsPruned(spark, tmp, ids, docs)
        .join(ids, "doc_id").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
      // derive the expectation from the SAME persisted id set (a
      // second limit(7) could pick different rows)
      val want = docs.join(ids, "doc_id").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === want)
    } finally ids.unpersist()
  }

  test("_graft_files manifest == the on-disk listing, and the " +
       "whole-tree manifest read equals the discovery read") {
    val tmp = java.nio.file.Files.createTempDirectory("pbmani")
      .resolve("idx").toString
    Dedup.writePartitionedBands(Dedup.minhashBands(spark, docs), tmp, 16)
    val manifest = Dedup.indexFilesManifest(tmp).get.toSet
    // independent listing of the same tree
    val base = java.nio.file.Paths.get(tmp)
    val walk = java.nio.file.Files.walk(base)
    val listed =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => base.relativize(p).toString)
          .filter(n =>
            n.substring(n.lastIndexOf('/') + 1).startsWith("part-"))
          .toSet
      } finally walk.close()
    assert(manifest === listed)
    assert(manifest.nonEmpty)
    assert(manifest.forall(_.startsWith("pb=")))
    // a probe covering EVERY bucket trips the coverage guard -> the
    // whole-tree manifest read; it must equal partition discovery
    val probe = Dedup.minhashBands(spark, docs).persist()
    try {
      probe.count()
      val viaManifest = Dedup.readBandIndexPruned(spark, tmp, probe)
        .collect().map(_.toSeq).toSet
      val viaDiscovery = spark.read.parquet(tmp).drop("pb")
        .collect().map(_.toSeq).toSet
      assert(viaManifest === viaDiscovery)
      assert(viaManifest.nonEmpty)
    } finally probe.unpersist()
  }

  test("partitioned layout with the manifest REMOVED (pre-r17 index): " +
       "the per-bucket existence fallback still reads correctly") {
    val tmp = java.nio.file.Files.createTempDirectory("pbnomani")
      .resolve("idx").toString
    Dedup.writePartitionedBands(Dedup.minhashBands(spark, docs), tmp, 64)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(tmp, "_graft_files"))
    assert(Dedup.indexFilesManifest(tmp).isEmpty)
    val probe = Dedup.minhashBands(spark, docs.limit(5)).persist()
    try {
      probe.count()
      def pairs(index: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        probe.as("d").join(index.as("c"),
            col("d.band") === col("c.band") && col("d.bh") === col("c.bh"))
          .select(col("d.doc_id"), col("c.doc_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaFallback = pairs(Dedup.readBandIndexPruned(spark, tmp, probe))
      val viaFull = pairs(spark.read.parquet(tmp).drop("pb"))
      assert(viaFallback === viaFull)
      assert(viaFallback.nonEmpty)
    } finally probe.unpersist()
  }

  test("cell-partitioned IVF artifact: readCellsPruned reads only the " +
       "probed cells' files, losslessly, keeping the cell column") {
    import graft.operators.Ann
    val path = Ann.ivfIndexPath(spark, dir)
    assert(Dedup.indexFilesManifest(path).nonEmpty,
      "the artifact build must write the manifest")
    val full = spark.read.parquet(path)
    val allCells = full.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(allCells.length > 2)
    val some = allCells.take(2)
    val pruned = QueryMetrics.profile(
      Ann.readCellsPruned(spark, path, some))
    val fullProf = QueryMetrics.profile(full)
    assert(pruned.filesRead < fullProf.filesRead)
    val got = Ann.readCellsPruned(spark, path, some)
      .collect().map(_.toSeq).toSet
    val want = full.filter(col("cell").isin(some.map(Integer.valueOf): _*))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // coverage guard: probing every cell reads the whole artifact
    val whole = Ann.readCellsPruned(spark, path, allCells)
      .collect().map(_.toSeq).toSet
    assert(whole === full.collect().map(_.toSeq).toSet)
  }

  test("unpartitioned legacy layout: no sidecar -> full-scan fallback") {
    val tmp = java.nio.file.Files.createTempDirectory("pbflat")
      .resolve("idx").toString
    val bands = Dedup.minhashBands(spark, docs.limit(20))
    bands.write.parquet(tmp)
    assert(Dedup.indexBuckets(tmp) === None)
    val probe = Dedup.minhashBands(spark, docs.limit(2))
    val back = Dedup.readBandIndexPruned(spark, tmp, probe)
    assert(back.count() === bands.count())
    assert(back.columns.toSeq === Seq("doc_id", "sig", "band", "bh"))
  }
}
