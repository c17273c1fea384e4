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

  test("compact_files: many fragments become few size-targeted files " +
       "with identical content") {
    val out = graft.operators.Maintenance.compactFiles(spark, dir)
    val src = spark.read.parquet(s"$dir/part.parquet")
    // value-exact both directions (the oracle's local twin)
    assert(out.count() === src.count())
    assert(out.except(src).count() === 0L && src.except(out).count() === 0L)
    // layout: the 64 fragments compacted down to the derived count —
    // at this SF the whole table fits one target file
    val base = out.inputFiles
    assert(base.nonEmpty && base.length < 64,
      s"expected < 64 compacted files, got ${base.length}")
    val fragDir = new java.io.File(new java.net.URI(base.head))
      .getParentFile.getParentFile
    val fragCount = new java.io.File(fragDir, "frag").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragCount === 64, s"fragment stage wrote $fragCount files")
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
