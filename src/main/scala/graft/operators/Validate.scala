package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.table

/** Data-quality gates a production lake runs between pipeline stages —
  * declarative constraint validation and distribution-drift scoring
  * (the Deequ / "expectations" class of tooling, re-expressed as plain
  * Spark aggregation). The reference has no quality surface at all;
  * these are first-class here because at 100 TB a malformed upstream
  * delivery is caught by exactly these two passes, not by eyeballs.
  */
object Validate {

  /** Declarative constraint validation in ONE scan (oracle-checked):
    * six rules over `lineitem` — not-null, three range/domain checks,
    * non-negativity, and key uniqueness — all evaluated as conditional
    * aggregates of a single pass, then unpivoted to one row per rule
    * with its violation count and verdict.
    *
    * Scale shape: the row-level rules ride one map-side-combined
    * aggregation (zero extra scans per rule — adding a rule adds a
    * column, not a pass); the uniqueness rule is `n - countDistinct(key)`
    * in the SAME aggregate (Spark plans the distinct as its standard
    * two-phase expand — the one shuffle this query has). Nothing is
    * collected; 100 TB costs one scan + one distinct-agg shuffle.
    *
    * Two rules FAIL by design on this data — `(l_orderkey,l_linenumber)`
    * is genuinely non-unique in the synthetic corpus and `l_tax` exceeds
    * the planted 0.05 cap — so the query proves violations are DETECTED,
    * not just that green data passes.
    */
  def validateConstraints(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "lineitem")
    val one = src.agg(
      count(lit(1)).as("_n"),
      count(col("l_shipdate")).as("_ship_cnt"),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
        .otherwise(0L)).as("_qty_bad"),
      sum(when(col("l_tax") < 0.0 || col("l_tax") > 0.05, 1L)
        .otherwise(0L)).as("_tax_bad"),
      sum(when(col("l_extendedprice") < 0.0, 1L).otherwise(0L))
        .as("_price_bad"),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("_rf_bad"),
      countDistinct(col("l_orderkey") * 10 + col("l_linenumber"))
        .as("_key_ndv"))
    one.select(col("_n").as("checked"), expr(
        """stack(6,
           'not_null(l_shipdate)', _n - _ship_cnt,
           'range(l_quantity,1,50)', _qty_bad,
           'range(l_tax,0,0.05)', _tax_bad,
           'non_negative(l_extendedprice)', _price_bad,
           'domain(l_returnflag,A|N|R)', _rf_bad,
           'unique(l_orderkey,l_linenumber)', _n - _key_ndv)""")
        .as(Seq("rule", "violations")))
      .select(col("rule"), col("checked"), col("violations"),
        (col("violations") === 0L).as("pass"))
  }

  def validateConstraintsOracleSql: String = """
    WITH a AS (
      SELECT count(*) AS n,
        count(l_shipdate) AS ship_cnt,
        CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) AS BIGINT) AS qty_bad,
        CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.05
                 THEN 1 ELSE 0 END) AS BIGINT) AS tax_bad,
        CAST(sum(CASE WHEN l_extendedprice < 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS price_bad,
        CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
                 THEN 1 ELSE 0 END) AS BIGINT) AS rf_bad,
        count(DISTINCT l_orderkey * 10 + l_linenumber) AS key_ndv
      FROM lineitem)
    SELECT r.rule, a.n AS checked, r.violations,
      r.violations = 0 AS pass
    FROM a, LATERAL (
      SELECT 'not_null(l_shipdate)' AS rule, a.n - a.ship_cnt AS violations
      UNION ALL SELECT 'range(l_quantity,1,50)', a.qty_bad
      UNION ALL SELECT 'range(l_tax,0,0.05)', a.tax_bad
      UNION ALL SELECT 'non_negative(l_extendedprice)', a.price_bad
      UNION ALL SELECT 'domain(l_returnflag,A|N|R)', a.rf_bad
      UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', a.n - a.key_ndv
    ) r"""

  /** Population-Stability-Index drift between two dataset snapshots
    * (oracle-checked): documents split by `doc_id` parity into a
    * baseline and a current population, `n_chars` bucketed into 10
    * equal-width bins over the GLOBAL min/max (integer arithmetic, so
    * binning is bit-identical cross-engine), per-bin proportions
    * compared as `(p−q)·ln(p/q)` with 1e-6 floor smoothing — the
    * standard drift score a training pipeline alarms on when a new
    * crawl's length distribution shifts.
    *
    * Scale shape: one scan for the global bounds (2 scalars,
    * broadcast), one binned groupBy (10 keys — a trivial shuffle),
    * per-bin math on the driver-free plan. Counts are exact and
    * hash-checked; the contribution is rounded to 6 dp so cross-engine
    * `ln` ULP noise cannot flip the hash.
    */
  def driftPsi(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val bounds = src.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
    val counts = src.crossJoin(broadcast(bounds))
      .withColumn("bin", least(lit(9L),
        expr("((n_chars - mn) * 10) DIV (mx - mn + 1)")).cast("int"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("base_n"),
        sum(when(col("doc_id") % 2 =!= 0, 1L).otherwise(0L)).as("cur_n"))
    val tot = counts.agg(sum("base_n").as("bt"), sum("cur_n").as("ct"))
    val p = greatest(col("base_n") / col("bt"), lit(1e-6))
    val q = greatest(col("cur_n") / col("ct"), lit(1e-6))
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("base_n"), col("cur_n"),
        round((p - q) * log(p / q), 6).as("psi_contrib"))
  }

  def driftPsiOracleSql: String = """
    WITH b AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx
               FROM documents),
    counts AS (
      SELECT least(9, ((n_chars - b.mn) * 10) // (b.mx - b.mn + 1)) AS bin,
        CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS base_n,
        CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS cur_n
      FROM documents, b GROUP BY 1),
    tot AS (SELECT sum(base_n) AS bt, sum(cur_n) AS ct FROM counts)
    SELECT CAST(bin AS INT) AS bin, base_n, cur_n,
      round((greatest(base_n / CAST(bt AS DOUBLE), 1e-6)
             - greatest(cur_n / CAST(ct AS DOUBLE), 1e-6))
        * ln(greatest(base_n / CAST(bt AS DOUBLE), 1e-6)
             / greatest(cur_n / CAST(ct AS DOUBLE), 1e-6)), 6)
        AS psi_contrib
    FROM counts, tot"""
}
