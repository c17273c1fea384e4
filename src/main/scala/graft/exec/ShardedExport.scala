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
  *    directory and salt shard (the guarantee the test pins via
  *    ExportStats). The bytes themselves are NOT identical across runs:
  *    parquet footers embed writer metadata and part-file names embed
  *    task IDs.
  */
object ShardedExport {

  final case class ExportStats(files: Long, rows: Long,
                               partitions: Map[String, Long])

  /** Export `df` under `outDir` partitioned by `cols`, each file capped
    * at `maxRecordsPerFile` rows. Returns per-partition row counts read
    * back from the committed files (a verification read, not a cache).
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
    val counts = back.groupBy(cols.map(col): _*).count().collect()
      .map(r => cols.indices.map(i => s"${cols(i)}=${r.get(i)}")
        .mkString("/") -> r.getLong(cols.length)).toMap
    val nFiles = {
      val fs = new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(outDir), true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    ExportStats(nFiles, counts.values.sum, counts)
  }

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
