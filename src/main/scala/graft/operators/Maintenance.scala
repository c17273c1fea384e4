package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.sources.Tables.table

/** Lake-maintenance operators: the passes a 100 TB table needs between
  * queries, not inside them. The reference has no table-maintenance
  * surface at all (its results directory is write-once,
  * materialize_files_task.rs); these are first-class, oracle-checked
  * operators here because at scale they gate every downstream read.
  */
object Maintenance {

  /** Target output file size for [[compactFiles]] — the small-file
    * compaction knob. 128 MB matches the scan-split sweet spot
    * (`spark.sql.files.maxPartitionBytes`'s default), so a compacted
    * table plans one task per file with no split seams.
    */
  val TargetFileBytes: Long = 128L << 20

  /** Small-file compaction (oracle-checked): fragment the `part` table
    * into many tiny files (the state every streaming/incremental ingest
    * leaves behind), then compact to a SIZE-DERIVED file count and
    * return the re-read rows. The DuckDB oracle reads the original
    * table, so the hash match proves compaction is value-exact — the
    * whole point of a maintenance pass is that queries cannot tell it
    * ran, except by being faster.
    *
    * Scale shape: the fragment write and the compaction rewrite are
    * plain distributed `df.write`s; the target count comes from the
    * fragmented directory's byte size via the Hadoop FS API (holds on
    * s3a/hdfs URIs — the numBucketsFor device), and the rewrite
    * round-robin `repartition(n)` spreads rows evenly so output files
    * land near [[TargetFileBytes]] each. Nothing is collected; at
    * 100 TB this is the nightly compactor jobgraph verbatim.
    */
  def compactFiles(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "part")
    val base = graft.sources.RoundTrip.scratch(s, "compact", dir)
    val frag = s"$base/frag"
    val out = s"$base/compacted"
    src.repartition(64).write.mode("overwrite").parquet(frag)
    val fragPath = new org.apache.hadoop.fs.Path(frag)
    val fs = fragPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(fragPath).getLength
    val n = math.max(1L,
      (bytes + TargetFileBytes - 1) / TargetFileBytes).toInt
    s.read.parquet(frag).repartition(n)
      .write.mode("overwrite").parquet(out)
    graft.sources.Tables.readFiles(s, s"$out/*.parquet")
  }

  /** Contiguous 0-based row-id assignment in `doc_id` order
    * (oracle-checked) — the sample-index column a training pipeline
    * stamps before sharding, where `monotonically_increasing_id` is
    * non-contiguous and `row_number() OVER (ORDER BY ...)` collapses
    * the corpus into ONE window partition.
    *
    * The scalable formulation is the classic two-pass offset scheme:
    * range-partition + sort within partitions (the distributed sort
    * Spark already does well), count rows per partition (a
    * #partitions-sized driver array — O(parallelism), not O(rows)),
    * prefix-sum the counts into per-partition offsets, then stamp
    * offset + local index in one mapPartitions pass. This is the one
    * legitimately imperative per-partition step in the codebase's
    * relational surface, hence the RDD hop. Ids are deterministic
    * regardless of where range boundaries land: partitions are ordered
    * by range and rows sorted within, so the global order — and thus
    * every id — is the total `doc_id` order.
    */
  def assignRowIds(s: SparkSession, dir: String): DataFrame = {
    val parted = table(s, dir, "documents").select(col("doc_id"))
      .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    val rdd = parted.rdd
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val stamped = rdd.mapPartitionsWithIndex { (i, it) =>
      var j = 0L
      it.map { r =>
        val out = Row(r.getLong(0), offsets(i) + j)
        j += 1L
        out
      }
    }
    s.createDataFrame(stamped, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("idx", LongType, nullable = false))))
  }
}
