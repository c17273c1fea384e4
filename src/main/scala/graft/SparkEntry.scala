package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the beyond-reference
  * classes the north star requires) is declared here as a named query; for
  * each SQL-expressible one, `oracleSql` holds the equivalent ANSI SQL that
  * DuckDB runs over the same parquet tables.
  *
  * Column-name AND column-type parity with the oracle is deliberate:
  * aggregates are aliased identically on both sides; integer-ish results are
  * cast to the same width (DuckDB's sum(BIGINT)→HUGEINT, row_number→BIGINT,
  * double→BIGINT cast rounds-not-truncates are all worked around explicitly);
  * money sums go through DECIMAL(18,2) on both sides so they are exact and
  * independent of accumulation order (see Relational.dsum).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-shaped: 3-way join + exact-decimal aggregation + top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference-implemented algebra (SURVEY.md §2.1) ---
    "scan_read_files" -> (Relational.scan _),
    "filter_where" -> (Relational.filterWhere _),
    "project_expr" -> (Relational.projectExpr _),
    "sort_orderby" -> (Relational.sortOrderBy _),
    "limit_topk" -> (Relational.limitTopK _),
    "distinct_select" -> (Relational.distinctSelect _),
    // --- beyond-reference relational (SURVEY.md §2.3 / §7.3 step 5) ---
    "q1_agg" -> (Relational.q1Agg _),
    "agg_having" -> (Relational.aggHaving _),
    "rollup_agg" -> (Relational.rollupAgg _),
    "join_inner" -> (Relational.joinInner _),
    "join_left" -> (Relational.joinLeft _),
    "join_semi" -> (Relational.joinSemi _),
    "join_anti" -> (Relational.joinAnti _),
    "join_broadcast_dims" -> (Relational.joinBroadcastDims _),
    "q3_join_agg" -> (Relational.q3JoinAgg _),
    "window_rank" -> (Relational.windowRank _),
    "window_running" -> (Relational.windowRunning _),
    "setop_union" -> (Relational.setopUnion _),
    "setop_intersect" -> (Relational.setopIntersect _),
    "setop_except" -> (Relational.setopExcept _),
    "cte_query" -> (Relational.cteQuery _),
    "case_cast_like" -> (Relational.caseCastLike _),
    "events_window" -> (Relational.eventsWindow _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "scan_read_files" -> "SELECT * FROM lineitem",
    "filter_where" ->
      "SELECT * FROM lineitem WHERE l_orderkey % 2 = 0 AND l_quantity > 10.0",
    "project_expr" -> """
      SELECT l_orderkey, l_linenumber,
        l_quantity + 1.0 / (2.0 + l_tax) * l_discount AS nested_arith,
        l_extendedprice - l_discount * l_extendedprice AS minus_expr,
        l_quantity % 7 AS mod7,
        (l_quantity > 25.0 AND l_discount <= 0.05) AS flag,
        l_returnflag || '|' || l_linestatus AS rf_ls
      FROM lineitem""",
    "sort_orderby" -> """
      SELECT * FROM lineitem
      ORDER BY l_returnflag DESC, l_shipdate, l_orderkey, l_linenumber""",
    "limit_topk" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",
    "distinct_select" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) * CAST(1.0 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
        sum(l_quantity) / count(l_quantity) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "agg_having" -> """
      SELECT l_suppkey,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        count(*) AS n_items
      FROM lineitem GROUP BY l_suppkey HAVING count(*) > 50""",
    "rollup_agg" -> """
      SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        count(*) AS n,
        CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "join_inner" -> """
      SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
      FROM orders JOIN customer ON o_custkey = c_custkey""",
    "join_left" -> """
      SELECT c_custkey, c_name, o_orderkey, o_totalprice
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey""",
    "join_semi" -> """
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 50000.0)""",
    "join_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_totalprice > 300000.0)""",
    "join_broadcast_dims" -> """
      SELECT s_suppkey, s_name, n_name AS nation, r_name AS region
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey""",
    "q3_join_agg" -> """
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND o_orderkey = l_orderkey
      GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "window_rank" -> """
      SELECT * FROM (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem) t
      WHERE rn <= 5""",
    "window_running" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
        sum(l_quantity) OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_quantity
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      FROM lineitem""",
    "setop_union" -> """
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45.0""",
    "setop_intersect" -> """
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_orderkey FROM lineitem WHERE l_quantity > 45.0""",
    "setop_except" -> """
      SELECT l_orderkey FROM lineitem
      EXCEPT
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'""",
    "cte_query" -> """
      WITH totals AS (
        SELECT o_custkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_custkey),
      a AS (
        SELECT CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_total
        FROM totals)
      SELECT o_custkey, total FROM totals, a WHERE total > avg_total * 2.0""",
    "case_cast_like" -> """
      SELECT p_partkey,
        CASE WHEN p_size < 10 THEN 'small'
             WHEN p_size < 30 THEN 'medium'
             ELSE 'large' END AS size_class,
        CAST(floor(p_retailprice) AS BIGINT) AS price_long,
        p_name LIKE '%green%' AS is_green,
        upper(p_brand) AS brand_upper,
        substring(p_type, 1, 5) AS type_prefix,
        CAST(length(p_name) AS INT) AS name_len
      FROM part""",
    "events_window" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        event_type, count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2""",
  )
}
