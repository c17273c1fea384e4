package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lake-maintenance operators: compaction must be invisible to queries
  * except in the file layout; id assignment must equal the one-window
  * formulation it replaces.
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("compact_files: fragments bin-packed away, content identical") {
    val out = graft.operators.Maintenance.compactFiles(spark, dir)
    val src = spark.read.parquet(s"$dir/part.parquet")
    // value-exact both directions (the oracle's local twin)
    assert(out.count() === src.count())
    assert(out.except(src).count() === 0L && src.except(out).count() === 0L)
    // layout: 2 right-sized files + 48 fragments in, far fewer files out
    val base = out.inputFiles
    assert(base.nonEmpty && base.length < 10,
      s"expected the 48 fragments packed away, got ${base.length} files")
  }

  test("compactSelective: right-sized files stay BYTE-IDENTICAL in " +
       "place; only fragments are rewritten") {
    import graft.operators.Maintenance
    val base = java.nio.file.Files.createTempDirectory("selcomp").toString
    val mixed = s"$base/table"
    // synthetic rows with a real payload so file sizes are data-driven,
    // not parquet-overhead-driven, and the small/large split is sharp
    val src = spark.range(4000).select(col("id"),
      concat(lit("pay-"), lpad(col("id").cast("string"), 200, "x"))
        .as("pay"))
    src.filter(col("id") % 4 =!= 0).repartition(2)
      .write.mode("overwrite").parquet(mixed)
    src.filter(col("id") % 4 === 0).repartition(24)
      .write.mode("append").parquet(mixed)
    def listing() = new java.io.File(mixed).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length,
        java.util.Arrays.hashCode(
          java.nio.file.Files.readAllBytes(f.toPath)))).sortBy(_._1)
    val before = listing()
    val threshold = before.map(_._2).max / 2
    val (bigBefore, smallBefore) = before.partition(_._2 >= threshold)
    assert(bigBefore.length === 2 && smallBefore.length === 24)
    val stats = Maintenance.compactSelective(spark, mixed, threshold)
    assert(stats.untouched === 2)
    assert(stats.rewrittenSmall === 24)
    val after = listing()
    // the planted right-sized files survive with name+length+bytes intact
    assert(after.filter(f => bigBefore.exists(_._1 == f._1)).toSeq ===
      bigBefore.toSeq)
    // every fragment is gone; outputs replaced them
    assert(after.count(f => smallBefore.exists(_._1 == f._1)) === 0)
    assert(after.length === 2 + stats.outputsWritten)
    // and the table's content is untouched
    val back = spark.read.parquet(mixed)
    assert(back.except(src).count() === 0L && src.except(back).count() === 0L)
    // a second pass is a no-op: at most the single residual packed
    // output is below threshold, and one small file is never repacked
    val again = Maintenance.compactSelective(spark, mixed, threshold)
    assert(again.rewrittenSmall === 0)
    assert(again.bytesRewritten === 0L)
  }

  test("compactSelective recurses into hive partitions: fragments pack " +
       "WITHIN their partition; partition values survive") {
    import graft.operators.Maintenance
    val base = java.nio.file.Files.createTempDirectory("partcomp").toString
    val mixed = s"$base/table"
    val src = spark.range(3000).select(col("id"),
      (col("id") % 3).cast("int").as("y"),
      concat(lit("pay-"), lpad(col("id").cast("string"), 200, "x"))
        .as("pay"))
    // each of the 3 partitions gets 16 fragments
    src.repartition(16).write.partitionBy("y")
      .mode("overwrite").parquet(mixed)
    def leafFiles(y: Int) = new java.io.File(s"$mixed/y=$y").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert((0 to 2).forall(y => leafFiles(y).length == 16))
    val stats = Maintenance.compactSelective(spark, mixed,
      smallThreshold = 10L << 20) // everything is small at this scale
    assert(stats.rewrittenSmall === 48)
    // packed per partition: one output per leaf, never cross-partition
    (0 to 2).foreach(y => assert(leafFiles(y).length === 1, s"y=$y"))
    // values (including the dir-encoded partition column) intact —
    // select in source order: the read appends the partition col last
    val back = spark.read.parquet(mixed).select("id", "y", "pay")
    assert(back.count() === 3000L)
    assert(back.except(src).count() === 0L && src.except(back).count() === 0L)
  }

  test("assign_row_ids: contiguous 0-based ids in doc_id order, equal " +
       "to the window formulation") {
    val out = graft.operators.Maintenance.assignRowIds(spark, dir)
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === n.toInt)
    // contiguous cover of [0, n)
    assert(rows.map(_._2).sorted.toSeq === (0L until n).toSeq)
    // equal to the single-window ground truth on this small corpus
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => (d, i.toLong) }
    assert(rows.sortBy(_._2).toSeq === expected.toSeq)
    // and the plan must NOT contain a one-partition window: the whole
    // point of the two-pass offset scheme
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(600))
  }
}
