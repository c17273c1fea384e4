package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables.table

/** Relational operator surface.
  *
  * Covers the reference's implemented algebra — scan (read_files_task.rs),
  * filter (filter_task.rs:65-144), projection with expression evaluation
  * (record_projection.rs:16-76, compute_value.rs), distributed ORDER BY
  * (partition_task.rs + sort_task.rs; note the reference's sort stage is an
  * unfinished stub at sort_task.rs:107 — ours completes it) — plus the
  * operator classes the reference's README declares but does not implement
  * (README.md:60-72): joins, aggregation/HAVING, windows, set ops, LIMIT,
  * DISTINCT, CTEs. Each is expressed declaratively so Catalyst applies
  * pushdown/pruning and picks physical strategies (broadcast vs SMJ, etc.).
  *
  * Scale posture per operator is documented on each method.
  */
object Relational {

  /** Exact, order-independent sum for money-like doubles: casting to
    * DECIMAL(18,2) before summing makes the aggregate independent of
    * partition/accumulation order, so results are reproducible across any
    * cluster size (and bit-identical to the DuckDB oracle). Final cast back
    * to double for a stable output type.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact decimal product of two money-like doubles. */
  def dmul(a: Column, b: Column): Column =
    a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- scans

  /** Plain scan: the reference's `read_files` demo is `select * from
    * read_files('simple/STAR.parquet')` (glob). Column pruning + pushdown come
    * free from the Parquet DSv2 scan (the reference lists both as TODOs,
    * DEV_NOTES.md).
    */
  def scan(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.readFiles(s, s"$dir/lineitem.parquet")

  /** Reference demo query shape: `select * from read_files(...) where
    * id % 2 = 0` (sample_queries/huge_simple.sql) plus a float comparison
    * (`value2 > 10.0`, README.md:84-86). Predicates reach the Parquet
    * reader as PushedFilters — at 100 TB this is row-group stats skipping.
    */
  def filterWhere(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .filter(col("l_orderkey") % 2 === 0 && col("l_quantity") > 10.0)

  /** Projection with computed expressions, mirroring the reference's
    * expression interpreter surface (compute_value.rs:63-343): nested
    * arithmetic `a + 1.0/(2.0 + c) * b` (test_compute_value.rs:126-175),
    * comparisons, boolean logic — plus the operators the reference leaves
    * unimplemented (binary minus, concat). Per-row, no shuffle; runs inside
    * whole-stage codegen.
    */
  def projectExpr(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem").select(
      col("l_orderkey"),
      col("l_linenumber"),
      (col("l_quantity") + lit(1.0) / (lit(2.0) + col("l_tax")) * col("l_discount"))
        .as("nested_arith"),
      (col("l_extendedprice") - col("l_discount") * col("l_extendedprice"))
        .as("minus_expr"),
      (col("l_quantity") % 7).as("mod7"),
      (col("l_quantity") > 25.0 && col("l_discount") <= 0.05).as("flag"),
      concat(col("l_returnflag"), lit("|"), col("l_linestatus")).as("rf_ls"))

  /** Full distributed ORDER BY — the capability the reference's two-stage
    * sample→range-partition→sort pipeline (partition_task.rs:70-324,
    * sort_task.rs) attempts. Spark plans exactly that shape natively:
    * ShuffleExchangeExec(RangePartitioning) driven by reservoir sampling,
    * then per-partition SortExec — scales to any input size with spill.
    */
  def sortOrderBy(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .orderBy(col("l_returnflag").desc, col("l_shipdate").asc,
        col("l_orderkey").asc, col("l_linenumber").asc)

  /** ORDER BY + LIMIT: Catalyst plans TakeOrderedAndProject — a per-partition
    * top-k + single merge, NOT a global sort. At 100 TB this avoids the full
    * range-partition shuffle entirely. Tie-broken on the unique key so the
    * result set is deterministic.
    */
  def limitTopK(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(100)

  /** DISTINCT — hash aggregate with map-side partial dedup before the
    * shuffle, so shuffle volume is bounded by cardinality, not row count.
    */
  def distinctSelect(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()

  // ----------------------------------------------------------- aggregation

  /** TPC-H Q1-shaped pricing summary. Partial (map-side) aggregation means
    * the shuffle carries only |groups| * partitions rows — at 100 TB the
    * shuffle is KBs. All money sums use exact decimal arithmetic (dsum).
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dmul(col("l_extendedprice"), lit(1.0) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dmul(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")).cast(DecimalType(18, 2)))
          .cast("double").as("sum_charge"),
        (sum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(col("l_extendedprice")))
          .as("avg_price"),
        (dsum(col("l_discount")) / count(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** GROUP BY + HAVING (reference README.md:63 unchecked). HAVING is just a
    * post-aggregation filter — no extra shuffle.
    */
  def aggHaving(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_items"))
      .filter(col("n_items") > 50)

  /** ROLLUP with grouping_id to disambiguate subtotal rows. Same single
    * shuffle as a plain aggregate (Spark expands grouping sets map-side).
    */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))

  // ---------------------------------------------------------------- joins

  /** Inner join orders⋈customer. customer is small relative to orders at any
    * SF ratio, so AQE converts to broadcast when under threshold; at 100 TB
    * with a huge customer table this becomes a co-partitioned SMJ on the
    * join key.
    */
  def joinInner(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders").join(table(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("c_custkey"),
        col("c_name"), col("c_mktsegment"))

  /** Left outer join: every customer, with order columns null when absent. */
  def joinLeft(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").join(table(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"))

  /** Left semi join = EXISTS. Only the left side's columns flow — Spark
    * dedups build-side keys, so shuffle volume is key-only.
    */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").join(
        table(s, dir, "orders").filter(col("o_totalprice") > 50000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** Left anti join = NOT EXISTS: customers with no large order. */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").join(
        table(s, dir, "orders").filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Explicit broadcast of small dims through a 3-way star join — at 100 TB
    * region/nation stay tiny, so both joins are broadcast hash joins with
    * zero shuffle of the fact side.
    */
  def joinBroadcastDims(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "supplier")
      .join(broadcast(table(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"),
        col("r_name").as("region"))

  /** TPC-H Q3-shaped: 3-way join + aggregate + top-k. The two joins hash on
    * different keys (custkey then orderkey) — unavoidable re-shuffle; AQE
    * re-plans the second join off the first's runtime stats.
    */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(table(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
      .agg(sum(dmul(col("l_extendedprice"), lit(1.0) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)

  // -------------------------------------------------------------- windows

  /** Ranking window functions. One shuffle on the partition key; within
    * each partition a local sort. Deterministic: row_number's ordering is
    * made unique with the key tiebreak.
    */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
  }

  /** Running (cumulative) sum per order — frame ROWS UNBOUNDED PRECEDING.
    * Partition key (l_orderkey) has bounded group size, so no skew risk.
    * Ordering note: (l_orderkey, l_linenumber) is NOT unique in this data,
    * so l_quantity joins the sort key — remaining ties are then identical in
    * the summed column, making the running sum order-insensitive.
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("running_qty", sum(col("l_quantity")).over(w))
  }

  // -------------------------------------------------------------- set ops

  def setopUnion(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    li.filter(col("l_returnflag") === "R").select("l_orderkey", "l_linenumber")
      .union(li.filter(col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber"))
  }

  def setopIntersect(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    li.filter(col("l_returnflag") === "R").select("l_orderkey")
      .intersect(li.filter(col("l_quantity") > 45.0).select("l_orderkey"))
  }

  def setopExcept(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    li.select("l_orderkey").except(
      li.filter(col("l_returnflag") === "R").select("l_orderkey"))
  }

  // ------------------------------------------------- subqueries / CTE / misc

  /** CTE + correlated-style subquery expressed as a join: customers whose
    * total order value exceeds 2x the average customer total.
    */
  def cteQuery(s: SparkSession, dir: String): DataFrame = {
    val totals = table(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total"))
    val avgTotal = totals.agg(
      (dsum(col("total")) / count(lit(1))).as("avg_total"))
    totals.crossJoin(avgTotal)
      .filter(col("total") > col("avg_total") * 2.0)
      .select(col("o_custkey"), col("total"))
  }

  /** Recursive CTE (oracle-checked) through the SQL facade: Spark 4.1
    * executes `WITH RECURSIVE` natively (SPARK-24497; probe-verified on
    * this build), so the hand-unrolled iteration the engine previously
    * mirrored for DuckDB's recursion (`dedup_clusters`,
    * `label_propagation`) now has a declarative sibling. The walk is a
    * halving chain `cur → cur div 2` from each `doc_id` down to 0 —
    * strictly decreasing, so termination is structural in BOTH engines
    * (no cycle-breaking semantics to align) and the depth-to-root is
    * `floor(log2(doc_id)) + 1`, a value the oracle recomputes through
    * its own recursion rather than a closed form.
    *
    * Scale shape: each recursion step is one join-free projection +
    * filter over the previous step's frame; Spark plans the loop as
    * iterated UNION ALL steps with the same pushdown/codegen as any
    * other plan, and depth is logarithmic in the key domain.
    */
  def cteRecursive(s: SparkSession, dir: String): DataFrame =
    graft.sql.QueryFacade.run(s,
      s"""WITH RECURSIVE walk (doc_id, cur, depth) AS (
           SELECT doc_id, doc_id AS cur, 0 AS depth
           FROM read_files('$dir/documents.parquet')
           UNION ALL
           SELECT doc_id, cur DIV 2 AS cur, depth + 1 AS depth
           FROM walk WHERE cur > 0
         )
         SELECT doc_id, max(depth) AS depth_to_root
         FROM walk GROUP BY doc_id""")

  /** CASE WHEN / CAST / LIKE / string ops — the expression classes the
    * reference explicitly lacks (README.md:54-56, compute_value.rs:338-343).
    * All stay inside whole-stage codegen.
    */
  def caseCastLike(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "part").select(
      col("p_partkey"),
      when(col("p_size") < 10, lit("small"))
        .when(col("p_size") < 30, lit("medium"))
        .otherwise(lit("large")).as("size_class"),
      floor(col("p_retailprice")).as("price_long"),
      col("p_name").like("%green%").as("is_green"),
      upper(col("p_brand")).as("brand_upper"),
      substring(col("p_type"), 1, 5).as("type_prefix"),
      length(col("p_name")).as("name_len"))

  /** Tumbling-window aggregation over the events table (batch form; the
    * streaming form is graft.streaming.EventStreams). Timestamps formatted
    * to strings for a type-stable cross-engine result.
    */
  def eventsWindow(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
}
