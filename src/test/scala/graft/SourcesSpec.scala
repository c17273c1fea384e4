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
}
