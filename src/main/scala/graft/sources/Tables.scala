package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading for the engine.
  *
  * The reference has no catalog: its only source is the
  * `read_files('<glob>' [, connection=>'name'])` table function that lists a
  * storage backend (fs/S3 via OpenDAL) and streams every matching Parquet
  * file (reference: read_files_task.rs:156-291, logical_planner.rs:385-396).
  * Spark globs natively through the Hadoop filesystem layer, so the whole
  * operator collapses into `spark.read.parquet(glob)`; `connection=>` maps to
  * a filesystem scheme (file://, s3a://) configured on the Hadoop conf.
  *
  * Scale note: `spark.read.parquet` on a directory/glob plans one task per
  * file-split (`spark.sql.files.maxPartitionBytes`), so a 100 TB dataset of
  * many files parallelizes across all executors with no driver-side listing
  * bottleneck beyond the InMemoryFileIndex (which itself parallelizes listing
  * past `spark.sql.sources.parallelPartitionDiscovery.threshold`).
  */
object Tables {

  /** All driver-provided test tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one named table from a scale-factor directory.
    *
    * The parquet schema is memoized per (path, nanosAsLong-conf) — the
    * catalog role a bare-path lake is missing: without it EVERY
    * `spark.read.parquet` pays a footer-inference pass at PLAN time
    * (it surfaces as a 1-task job in the stage log), and a bench pass
    * over the registry re-infers the same ten immutable tables ~500
    * times. The conf is part of the key because it changes what
    * inference returns for TIMESTAMP(NANOS) columns (events.ts →
    * LongType under nanosAsLong). Same immutable-corpus-dir operating
    * assumption as fitCentroids/corpusCount memoization — a pipeline
    * that rewrites a table in place needs a new JVM or a new dir. Only
    * the SCHEMA is cached; file listings and data are re-read per
    * query as always.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong",
      "false")
    val schema = schemaCache.computeIfAbsent((path, nanos),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  /** The `read_files` analog: read every file matching a glob.
    * Reference semantics: schema is inferred from the files themselves
    * (read_files_task.rs:250-253); pass mergeSchema for drifting schemas.
    * The reference reads Parquet only; this surface additionally detects
    * CSV (with header, like the repo's Sources layer), JSON-lines, and
    * ORC from the glob's extension — parquet otherwise.
    */
  def readFiles(spark: SparkSession, glob: String,
                mergeSchema: Boolean = false): DataFrame = {
    // Files with TIMESTAMP(NANOS) columns must still be readable (the
    // reference streams whatever Arrow schema the file carries); Spark
    // surfaces them as raw nanosecond longs under this conf. Convert with
    // timestamp_micros(col DIV 1000) when timestamp semantics are needed
    // (see Tables.events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val lower = glob.toLowerCase
    if (lower.endsWith(".csv"))
      // CSV has no mergeSchema concept; header+inference matches Sources
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(glob)
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl"))
      spark.read.json(glob) // JSON inference unions schemas natively
    else if (lower.endsWith(".orc"))
      spark.read.option("mergeSchema", mergeSchema.toString).orc(glob)
    else spark.read.option("mergeSchema", mergeSchema.toString).parquet(glob)
  }

  /** The events table's `ts` physical type has drifted across testdata
    * generations — TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * with [PARQUET_TYPE_ILLEGAL] unless read as a raw long) in some drops,
    * plain TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ under Spark's
    * inferTimestampNTZ default) in others. Normalize every variant to a
    * session-TZ TimestampType so downstream operators see one schema:
    *  - LongType (nanos-as-long): `timestamp_micros(ts DIV 1000)` — `DIV`,
    *    not `/`, because a double mantissa can't hold nanosecond epochs
    *    (~1.7e18 > 2^53).
    *  - TIMESTAMP_NTZ: cast to TimestampType; every graft session pins
    *    `spark.sql.session.timeZone=UTC` (GraftSession) so the cast is
    *    epoch-identity and matches DuckDB's naive read of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        df // already a session-TZ timestamp
      case other =>
        // a FOURTH generation (e.g. a future drop surfacing StringType)
        // must fail here, at the source, with the drift named — not
        // flow a mistyped column into every downstream operator
        throw new IllegalStateException(
          s"events.ts drifted to unhandled type $other in $dir — " +
            "extend Tables.events' normalization for the new generation")
    }
  }

  /** Register every test table as a temp view so plain
    * `SELECT ... FROM tablename` SQL works — the reference parses a bare
    * table node (logical_planner.rs:392-395) but errors NotImplemented at
    * execution (builder.rs:67-72); here the session catalog completes it.
    * `events` goes through [[events]] so its TIMESTAMP(NANOS) column
    * surfaces as a real timestamp, not a raw nanosecond long.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
