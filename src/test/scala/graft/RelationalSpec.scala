package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Correctness specs for the relational operator surface on sf0.001.
  * The DuckDB hash-match oracle is the driver's gate (tools/check.py is the
  * local replica); these specs assert cheap structural invariants so
  * `sbt test` catches regressions without the oracle in the loop.
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("scan reads all lineitem rows") {
    assert(Relational.scan(spark, dir).count() === 6000L)
  }

  test("filter_where keeps only matching rows") {
    val df = Relational.filterWhere(spark, dir)
    assert(df.filter(col("l_orderkey") % 2 =!= 0 || col("l_quantity") <= 10.0)
      .count() === 0L)
    assert(df.count() > 0L)
  }

  test("project_expr computes nested arithmetic per-row") {
    val r = Relational.projectExpr(spark, dir)
      .select("nested_arith", "mod7").limit(1).collect()(0)
    assert(!r.isNullAt(0) && !r.isNullAt(1))
  }

  test("sort_orderby is globally ordered") {
    val flags = Relational.sortOrderBy(spark, dir)
      .select("l_returnflag").collect().map(_.getString(0))
    assert(flags.sameElements(flags.sortWith(_ > _)))
  }

  test("limit_topk returns exactly k rows, descending") {
    val prices = Relational.limitTopK(spark, dir)
      .collect().map(_.getDouble(2))
    assert(prices.length === 100)
    assert(prices.sameElements(prices.sortWith(_ > _)))
  }

  test("q1_agg groups cover all flag/status combos") {
    val df = Relational.q1Agg(spark, dir)
    assert(df.count() === Relational.distinctSelect(spark, dir).count())
    assert(df.filter(col("sum_qty") <= 0).count() === 0L)
  }

  test("window_running final value equals group sum") {
    val last = Relational.windowRunning(spark, dir)
      .groupBy("l_orderkey").agg(max("running_qty").as("final"))
    val direct = Relational.scan(spark, dir)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("direct"))
    val joined = last.join(direct, "l_orderkey")
      .filter(abs(col("final") - col("direct")) > 1e-9)
    assert(joined.count() === 0L)
  }

  test("semi + anti partition the customer set w.r.t. the same predicate") {
    val semi = Relational.joinSemi(spark, dir).count()
    val total = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(semi <= total)
  }

  test("setop_except excludes all R rows") {
    val ex = Relational.setopExcept(spark, dir)
    val r = Relational.scan(spark, dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey").distinct()
    assert(ex.join(r, "l_orderkey").count() === 0L)
  }

  test("rollup has grand total row") {
    val df = Relational.rollupAgg(spark, dir)
    val grand = df.filter(col("g_rf") === 1 && col("g_ls") === 1).collect()
    assert(grand.length === 1)
  }

  test("events_window sums match table total") {
    val winSum = Relational.eventsWindow(spark, dir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(winSum === 1000L)
  }

  test("cte_recursive: native WITH RECURSIVE walks the halving chain " +
       "to the closed-form depth") {
    val rows = Relational.cteRecursive(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.size === n.toInt)
    // depth_to_root(d) = halvings until 0 = floor(log2(d)) + 1; d=0 -> 0
    rows.foreach { case (d, depth) =>
      val expected =
        if (d == 0L) 0 else (63 - java.lang.Long.numberOfLeadingZeros(d)) + 1
      assert(depth === expected, s"doc $d")
    }
  }
}
