package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded training-data export — the writer end of the pipeline: a
  * curated/deduplicated corpus leaves the engine as Hive-partitioned
  * parquet shards that downstream trainers stream independently.
  *
  * Shape, designed for the 100 TB case:
  *  - `partitionBy(cols)` → one directory per partition value (lang,
  *    quality bucket, date, ...) so trainers prune at the listing level;
  *  - `maxRecordsPerFile` bounds every shard so a single hot partition
  *    (e.g. lang=en at 90 % of the corpus) still yields many
  *    independently-streamable files instead of one giant one;
  *  - `repartition(partition cols + salt)` before the write: the salt
  *    (a deterministic hash of the row, mod `saltBuckets`) keeps a HOT
  *    partition value (lang=en at 90 % of the corpus) spread over many
  *    parallel tasks — a bare repartition(cols) would funnel it through
  *    ONE task — while still bounding open writers per task to a few
  *    partition values (the classic small-files/OOM write pattern);
  *  - deterministic ASSIGNMENT: no RNG, no timestamps — re-running the
  *    export over the same input routes every row to the same partition
  *    directory and salt shard (the guarantee the test pins via the
  *    stats sidecar). The bytes themselves are NOT identical across
  *    runs: parquet footers embed writer metadata and part-file names
  *    embed task IDs.
  *  - per-partition row counts leave the driver's hands entirely: they
  *    are written by a JOB as a `_stats` sidecar under the export root
  *    (underscore prefix — parquet partition discovery skips it), so
  *    [[ExportStats]] stays O(1) regardless of the partition column's
  *    cardinality. The old design collected the counts to a driver Map
  *    — bounded only by partition-value cardinality, which a 100 TB
  *    export over a high-cardinality column (date × lang × source)
  *    could blow.
  */
object ShardedExport {

  /** Bounded (O(1)) export receipt: shard count, total rows, and where
    * the per-partition count sidecar landed ([[readStats]]).
    */
  final case class ExportStats(files: Long, rows: Long, statsPath: String)

  /** Sidecar directory name under the export root. */
  val StatsDir = "_stats"

  /** Export `df` under `outDir` partitioned by `cols`, each file capped
    * at `maxRecordsPerFile` rows. Per-partition row counts are computed
    * from the committed files (a verification read, not a cache) and
    * written as a single-shard parquet sidecar at `outDir/_stats` —
    * one row per partition value, never collected to the driver.
    */
  def export(s: SparkSession, df: DataFrame, outDir: String,
             cols: Seq[String],
             maxRecordsPerFile: Long = 1000000L,
             saltBuckets: Int = 64): ExportStats = {
    require(cols.nonEmpty, "sharded export needs at least one partition column")
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets))
    df.repartition(cols.map(col) :+ salt: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .mode("overwrite")
      .parquet(outDir)
    val back = s.read.parquet(outDir)
    val statsPath = s"$outDir/$StatsDir"
    // counts ride a job end to end: groupBy → single-shard sidecar
    // write (the count frame is one row per partition VALUE — small —
    // but "small" is a cardinality bet the driver no longer makes).
    // Column order (cols..., rows) sorted by the partition tuple keeps
    // the sidecar deterministic for the re-export equality check.
    back.groupBy(cols.map(col): _*).agg(count(lit(1)).as("rows"))
      .sort(cols.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath)
    val rows = back.count()
    val nFiles = {
      val root = new org.apache.hadoop.fs.Path(outDir)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(root, true)
      var n = 0L
      while (it.hasNext) {
        val p = it.next().getPath
        // data shards only: the _stats sidecar is not an export shard
        if (p.getName.endsWith(".parquet") &&
            !p.toString.contains(s"/$StatsDir/")) n += 1
      }
      n
    }
    ExportStats(nFiles, rows, statsPath)
  }

  /** The per-partition counts of a prior [[export]], read back from its
    * sidecar: the partition columns plus a `rows` count.
    */
  def readStats(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/$StatsDir")

  /** The canonical pipeline export: documents that survive the quality
    * filter, sharded by language. A sink, not a driver query — ExecSpec
    * exercises it end to end (layout, caps, determinism).
    */
  def exportCurated(s: SparkSession, dir: String, outDir: String,
                    maxRecordsPerFile: Long = 1000000L): ExportStats = {
    val curated = graft.operators.TextOps.textQuality(s, dir)
      .filter(col("keep"))
      .join(graft.sources.Tables.table(s, dir, "documents"), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"), col("quality"))
    export(s, curated, outDir, Seq("lang"), maxRecordsPerFile)
  }
}
