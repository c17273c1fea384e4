package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format breadth: the reference reads ONLY Parquet (CSV/JSON are
  * unimplemented README checkboxes); here every format flows through the
  * same DataFrameReader path. Round-trips prove schema + values survive.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("csv round-trip with header + explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("csv").toString
    val src = spark.read.parquet(s"$dir/nation.parquet")
    src.write.option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$tmp/nation_csv")
    assert(back.count() === 25L)
    assert(back.except(src).count() === 0L && src.except(back).count() === 0L)
  }

  test("json-lines round-trip with schema inference") {
    val tmp = java.nio.file.Files.createTempDirectory("json").toString
    val src = spark.read.parquet(s"$dir/region.parquet")
    src.write.json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
      .select("r_regionkey", "r_name")
    assert(back.count() === 5L)
    assert(back.select(sum("r_regionkey")).collect()(0).getLong(0) === 10L)
  }

  test("orc round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("orc").toString
    val src = spark.read.parquet(s"$dir/supplier.parquet")
    src.write.orc(s"$tmp/supplier_orc")
    val back = spark.read.orc(s"$tmp/supplier_orc")
    assert(back.except(src).count() === 0L && src.except(back).count() === 0L)
  }

  test("registry round-trip scan queries are value-exact vs parquet") {
    // The driver's gate checks these against DuckDB; this is the local
    // Spark-side equivalent: the re-read rows must equal the same
    // projection taken straight from the parquet table, both directions.
    val expected = Map(
      "scan_csv_roundtrip" -> spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date")),
      "scan_json_roundtrip" -> graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s")),
      "scan_orc_roundtrip" -> spark.read.parquet(s"$dir/part.parquet"))
    for ((name, exp) <- expected) {
      val got = SparkEntry.queries(name)(spark, dir)
      assert(got.count() === exp.count(), name)
      val gotN = got.select(exp.columns.map(col).toIndexedSeq: _*)
      assert(gotN.except(exp).count() === 0L, s"$name: extra rows")
      assert(exp.except(gotN).count() === 0L, s"$name: missing rows")
    }
  }

  test("schema drift: widenMerge lattice, one-scan normalized read, " +
       "null pattern on the added column") {
    import graft.sources.SchemaDrift
    import org.apache.spark.sql.types._
    // widening lattice unit facts
    assert(SchemaDrift.widenMerge(Seq(
      StructType(Seq(StructField("k", IntegerType, nullable = false))),
      StructType(Seq(StructField("k", LongType), StructField("x", StringType)))
    )) === StructType(Seq(StructField("k", LongType),
      StructField("x", StringType))))
    // a string/int conflict is producer breakage, not drift
    intercept[SchemaDrift.DriftConflict] {
      SchemaDrift.widenMerge(Seq(
        StructType(Seq(StructField("k", StringType))),
        StructType(Seq(StructField("k", IntegerType)))))
    }

    val df = SparkEntry.queries("scan_schema_drift")(spark, dir)
    // normalized schema is pinned: widened BIGINT key, added column last
    assert(df.schema.map(f => (f.name, f.dataType)) === Seq(
      ("o_orderkey", LongType), ("o_custkey", LongType),
      ("o_orderstatus", StringType), ("o_totalprice", DoubleType),
      ("o_orderpriority", StringType)))
    // ONE FileSourceScan over both generation dirs — the whole point of
    // reading under a supplied widened schema instead of per-gen unions
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, df.queryExecution.executedPlan.toString.take(800))
    // value-exactness vs the source table, both directions
    val exp = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        when(col("o_orderkey") % 2 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("o_orderpriority"))
    assert(df.count() === exp.count())
    assert(df.except(exp).count() === 0L && exp.except(df).count() === 0L)
    // the added column is null exactly on generation-1 (even-key) rows
    assert(df.filter(col("o_orderkey") % 2 === 0 &&
      col("o_orderpriority").isNotNull).count() === 0L)
    assert(df.filter(col("o_orderkey") % 2 =!= 0 &&
      col("o_orderpriority").isNull).count() === 0L)
  }

  test("widen lattice: every non-trivial arm survives a write-then-" +
       "normalizedRead (the reader must EXECUTE the join type, not just " +
       "merge it)") {
    import graft.sources.SchemaDrift
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("lattice").toString
    // (caseName, writeType gen1, writeType gen2, expected joined type).
    // Values are 0..4 written through a cast to each side's type; the
    // read-back sum at the joined type must equal 2 * (0+1+2+3+4) = 20.
    val arms = Seq(
      ("int_long", "int", "long", LongType),
      ("byte_short", "tinyint", "smallint", ShortType),
      ("short_int", "smallint", "int", IntegerType),
      ("byte_long", "tinyint", "bigint", LongType),
      ("int_double", "int", "double", DoubleType),
      ("int_float", "int", "float", DoubleType), // joins at DOUBLE: no
      // Integer→Float updater exists, and double is lossless for both
      ("float_double", "float", "double", DoubleType),
      ("dec_prec_scale", "decimal(10,2)", "decimal(20,4)",
        DecimalType(20, 4)), // max(10−2, 20−4) + max(2,4)
      ("int_decimal", "int", "decimal(12,2)", DecimalType(12, 2)),
      ("long_decimal", "bigint", "decimal(22,2)", DecimalType(22, 2)))
    for ((name, ta, tb, expected) <- arms) {
      val g1 = s"$base/$name/g1"; val g2 = s"$base/$name/g2"
      spark.range(5).select(col("id").cast(ta).as("v"))
        .write.mode("overwrite").parquet(g1)
      spark.range(5).select(col("id").cast(tb).as("v"))
        .write.mode("overwrite").parquet(g2)
      val df = SchemaDrift.normalizedRead(spark, Seq(g1, g2))
      assert(df.schema.head.dataType === expected, name)
      // the sum forces actual cell decoding through the updater
      assert(df.agg(sum(col("v").cast("double"))).collect()(0)
        .getDouble(0) === 20.0, name)
    }
    // NESTED drift: struct gains a field; struct field widens; array
    // element widens — each must survive the one-scan read
    val sg1 = s"$base/nested/g1"; val sg2 = s"$base/nested/g2"
    spark.range(5).select(col("id"),
      struct(col("id").cast("int").as("a")).as("s"),
      array(col("id").cast("int")).as("arr"))
      .write.mode("overwrite").parquet(sg1)
    spark.range(5, 10).select(col("id"),
      struct(col("id").cast("long").as("a"), (col("id") * 2).as("b"))
        .as("s"),
      array(col("id").cast("long")).as("arr"))
      .write.mode("overwrite").parquet(sg2)
    val nested = SchemaDrift.normalizedRead(spark, Seq(sg1, sg2))
    assert(nested.schema("s").dataType === StructType(Seq(
      StructField("a", LongType), StructField("b", LongType))))
    assert(nested.schema("arr").dataType === ArrayType(LongType))
    val agg = nested.select(
      sum(col("s.a")).as("sa"), sum(col("s.b")).as("sb"),
      count(when(col("s.b").isNull, 1)).as("nb"),
      sum(element_at(col("arr"), 1)).as("ea")).collect()(0)
    assert(agg.getLong(0) === 45L) // widened struct field decodes
    assert(agg.getLong(1) === 70L) // added field from gen2 only
    assert(agg.getLong(2) === 5L)  // null exactly on gen1 rows
    assert(agg.getLong(3) === 45L) // widened array elements decode

    // date + timestamp_ntz joins at NTZ and decodes
    val dg1 = s"$base/date_ntz/g1"; val dg2 = s"$base/date_ntz/g2"
    spark.range(3).select(expr(
      "date_add(date'2020-01-01', cast(id as int))").as("v"))
      .write.mode("overwrite").parquet(dg1)
    spark.range(3).select(expr(
      "timestampadd(DAY, cast(id as int), timestamp_ntz'2021-01-01 06:00:00')")
      .as("v")).write.mode("overwrite").parquet(dg2)
    val dts = SchemaDrift.normalizedRead(spark, Seq(dg1, dg2))
    assert(dts.schema.head.dataType === TimestampNTZType)
    assert(dts.filter(col("v").isNotNull).count() === 6L)
    // arms the vectorized reader CANNOT execute are conflicts, not
    // landmines deferred to scan time (each was probe-verified to throw
    // SchemaColumnConvertNotSupportedException if allowed through)
    for ((a, b) <- Seq(
      (LongType, DoubleType), // no Long→Double updater
      (LongType, FloatType),
      (DateType, TimestampType), // only a Date→TimestampNTZ updater
      (DoubleType, DecimalType(20, 4)), // no binary-float→decimal
      (StringType, IntegerType),
      (DecimalType(38, 0), DecimalType(10, 9)))) { // joined prec 47 > 38
      intercept[SchemaDrift.DriftConflict] {
        SchemaDrift.widenMerge(Seq(
          StructType(Seq(StructField("k", a))),
          StructType(Seq(StructField("k", b)))))
      }
    }
  }

  test("drift_report classifies stable/widened/added/conflict per column") {
    import graft.sources.SchemaDrift
    val base = java.nio.file.Files.createTempDirectory("driftrep").toString
    spark.range(5).select(col("id").cast("int").as("k"),
      col("id").cast("string").as("mixed"), lit(1.0).as("keep"))
      .write.mode("overwrite").parquet(s"$base/g1")
    spark.range(5).select(col("id").as("k"), // int -> bigint: widened
      col("id").as("mixed"), // string vs bigint: conflict
      lit(2.0).as("keep"), // stable
      lit("x").as("extra")) // added
      .write.mode("overwrite").parquet(s"$base/g2")
    val rep = SchemaDrift.driftReport(spark, Seq(s"$base/g1", s"$base/g2"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(rep("k") === (("widened", "int", "bigint")))
    assert(rep("mixed")._1 === "conflict")
    assert(rep("keep") === (("stable", "double", "double")))
    assert(rep("extra") === (("added", null, "string")))
    // the normalizer itself refuses what the report calls a conflict
    intercept[SchemaDrift.DriftConflict] {
      SchemaDrift.normalizedRead(spark, Seq(s"$base/g1", s"$base/g2"))
    }
  }

  test("decimal drift query: one scan, widened DECIMAL(18,4) read schema") {
    import org.apache.spark.sql.types._
    val df = SparkEntry.queries("scan_decimal_drift")(spark, dir)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1)
    assert(scans.head.schema.fields.map(f => (f.name, f.dataType)).toSeq
      .contains(("o_totalprice", DecimalType(18, 4))))
    val exp = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0,
          col("o_totalprice").cast(DecimalType(12, 2)))
          .otherwise(col("o_totalprice").cast(DecimalType(18, 4)))
          .cast("double").as("total_price"))
    assert(df.except(exp).count() === 0L && exp.except(df).count() === 0L)
  }

  test("partition drift query: one scan PER LAYOUT SIGNATURE (2 total), " +
       "dir-encoded and footer-encoded values land identically") {
    val df = SparkEntry.queries("scan_partition_drift")(spark, dir)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 2, // not O(generations): one per layout
      df.queryExecution.executedPlan.toString.take(800))
    val exp = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    assert(df.count() === exp.count())
    assert(df.except(exp).count() === 0L && exp.except(df).count() === 0L)
    // a formerly-partitioned column still prunes inside its own group
    val pruned = SparkEntry.queries("scan_partition_drift")(spark, dir)
      .filter(col("o_orderstatus") === "F")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(o_orderstatus"))
    // a data-column predicate pushes into BOTH signature-group scans —
    // the union must not become a pushdown barrier
    val filtered = SparkEntry.queries("scan_partition_drift")(spark, dir)
      .filter(col("o_orderkey") > 1000L)
    val fscans = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(fscans.size === 2)
    fscans.foreach(sc => assert(
      sc.metadata.get("PushedFilters").exists(_.contains(
        "GreaterThan(o_orderkey,1000)")), sc.metadata.toString))
  }

  test("partitioned write prunes partitions on read (PartitionFilters)") {
    val tmp = java.nio.file.Files.createTempDirectory("part").toString
    spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
      .write.partitionBy("y").parquet(s"$tmp/orders_by_year")
    val pruned = spark.read.parquet(s"$tmp/orders_by_year")
      .filter(col("y") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(y"), plan.take(500))
    assert(pruned.count() ===
      spark.read.parquet(s"$dir/orders.parquet")
        .filter(year(col("o_orderdate")) === 1997).count())
  }

  test("table(): schema memo serves the inferred schema (values intact) " +
       "and keys on the nanosAsLong conf, so events' LongType ts cannot " +
       "leak into a session reading it as a timestamp") {
    import graft.sources.Tables
    // memoized read == a fresh inference, schema and values
    val memo1 = Tables.table(spark, dir, "nation")
    val memo2 = Tables.table(spark, dir, "nation")
    val fresh = spark.read.parquet(s"$dir/nation.parquet")
    assert(memo1.schema === fresh.schema)
    assert(memo2.schema === fresh.schema)
    assert(memo1.except(fresh).count() === 0L &&
      fresh.except(memo1).count() === 0L)
    // the conf participates in the key: under nanosAsLong the events ts
    // column infers to its raw physical type, and flipping the conf in
    // the same JVM must re-infer, not serve the other session's schema
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tOn = Tables.table(spark, dir, "events").schema("ts").dataType
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      val tOff =
        try Some(Tables.table(spark, dir, "events").schema("ts").dataType)
        catch { case _: Throwable => None } // NANOS drops reject the read
      // whichever generation the testdata drop is, the two keys must not
      // alias: either the conf-off read fails (TIMESTAMP(NANOS) data) or
      // it infers a different type than the conf-on long
      assert(tOff.forall(_ != tOn) ||
        tOn != org.apache.spark.sql.types.LongType)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None =>
          spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    }
  }
}
