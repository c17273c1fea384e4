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

  /** A declarative constraint. Each rule contributes ONE aggregate
    * column to a shared single-scan aggregation — a rule set of any
    * size costs one pass, never a pass per rule.
    *
    * NULL semantics: value rules (range/domain/non-negative) follow SQL
    * three-valued logic — a NULL cell is NOT a violation of a value
    * predicate, so a fully-nulled column passes them. Completeness is
    * its own dimension: pair every value rule with a [[NotNull]] on the
    * same column when absence itself is a defect.
    */
  sealed trait Rule {
    def name: String
    /** Aggregate expression counting this rule's violating rows. */
    def violations: org.apache.spark.sql.Column
  }
  final case class NotNull(c: String) extends Rule {
    def name = s"not_null($c)"
    def violations = sum(when(col(c).isNull, 1L).otherwise(0L))
  }
  final case class InRange(c: String, lo: Double, hi: Double) extends Rule {
    def name = s"range($c,$lo,$hi)"
    def violations = sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
  }
  final case class NonNegative(c: String) extends Rule {
    def name = s"non_negative($c)"
    def violations = sum(when(col(c) < 0, 1L).otherwise(0L))
  }
  final case class InDomain(c: String, allowed: Seq[String]) extends Rule {
    def name = s"domain($c,${allowed.mkString("|")})"
    def violations =
      sum(when(!col(c).isin(allowed: _*), 1L).otherwise(0L))
  }
  final case class UniqueKey(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
    // duplicates = rows minus distinct keys, both inside the one agg
    // (Spark plans the distinct as its standard two-phase expand — the
    // single shuffle a rule set containing uniqueness pays)
    def violations =
      count(lit(1)) - countDistinct(struct(cols.map(col): _*))
  }

  /** Evaluate a rule set against a frame in ONE scan: every rule is a
    * conditional aggregate of the same pass, unpivoted to a row per
    * rule with its violation count and verdict. Nothing is collected;
    * at 100 TB the cost is one scan (plus one distinct-agg shuffle iff
    * a [[UniqueKey]] rule is present).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.forall(r =>
        !r.name.contains("'") && !r.name.contains("\\")),
      "rule names must not contain quotes or backslashes — they are " +
        "embedded as stack() string literals, where both would be " +
        "parsed as escapes and silently rename the rule")
    val aggCols = count(lit(1)).as("_checked") +:
      rules.zipWithIndex.map { case (r, i) => r.violations.as(s"_v$i") }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', _v$i" }.mkString(", ")
    one.select(col("_checked"),
        expr(s"stack(${rules.length}, $stackArgs)")
          .as(Seq("rule", "violations")))
      .select(col("rule"), col("_checked").as("checked"),
        col("violations"), (col("violations") === 0L).as("pass"))
  }

  /** Registry query (oracle-checked): [[check]] with six rules over
    * `lineitem`. Two FAIL by design on this data —
    * `(l_orderkey,l_linenumber)` is genuinely non-unique in the
    * synthetic corpus and `l_tax` exceeds the planted 0.05 cap — so the
    * query proves violations are DETECTED, not just that green data
    * passes.
    */
  def validateConstraints(s: SparkSession, dir: String): DataFrame =
    check(table(s, dir, "lineitem"), Seq(
      NotNull("l_shipdate"),
      InRange("l_quantity", 1, 50),
      InRange("l_tax", 0, 0.05),
      NonNegative("l_extendedprice"),
      InDomain("l_returnflag", Seq("A", "N", "R")),
      UniqueKey(Seq("l_orderkey", "l_linenumber"))))

  def validateConstraintsOracleSql: String = """
    WITH a AS (
      SELECT count(*) AS n,
        CAST(sum(CASE WHEN l_shipdate IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS ship_null,
        CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) AS BIGINT) AS qty_bad,
        CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.05
                 THEN 1 ELSE 0 END) AS BIGINT) AS tax_bad,
        CAST(sum(CASE WHEN l_extendedprice < 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS price_bad,
        CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
                 THEN 1 ELSE 0 END) AS BIGINT) AS rf_bad,
        count(DISTINCT (l_orderkey, l_linenumber)) AS key_ndv
      FROM lineitem)
    SELECT r.rule, a.n AS checked, r.violations,
      r.violations = 0 AS pass
    FROM a, LATERAL (
      SELECT 'not_null(l_shipdate)' AS rule, a.ship_null AS violations
      UNION ALL SELECT 'range(l_quantity,1.0,50.0)', a.qty_bad
      UNION ALL SELECT 'range(l_tax,0.0,0.05)', a.tax_bad
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
  /** PSI between two arbitrary populations of one integral column: both
    * frames binned by the UNION's global min/max (equal-width, integer
    * arithmetic — bit-identical cross-engine), per-bin proportions
    * compared as `(p−q)·ln(p/q)` with `eps` floor smoothing. The
    * populations are tagged and unioned so the whole score is one
    * binned groupBy over one pass of each side; bounds are 2 broadcast
    * scalars.
    */
  def psi(baseline: DataFrame, current: DataFrame, c: String,
          bins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(!c.contains("`"), "column name must not contain backticks")
    val tagged = baseline.select(col(c), lit(1).as("_side"))
      .unionByName(current.select(col(c), lit(0).as("_side")))
    val bounds = tagged.agg(min(c).as("mn"), max(c).as("mx"))
    val counts = tagged.crossJoin(broadcast(bounds))
      .withColumn("bin", least(lit((bins - 1).toLong),
        // backticked so any legal column name survives the SQL fragment
        // (DIV has no Column-API form)
        expr(s"((`$c` - mn) * $bins) DIV (mx - mn + 1)")).cast("int"))
      .groupBy(col("bin"))
      .agg(sum(when(col("_side") === 1, 1L).otherwise(0L)).as("base_n"),
        sum(when(col("_side") === 0, 1L).otherwise(0L)).as("cur_n"))
    val tot = counts.agg(sum("base_n").as("bt"), sum("cur_n").as("ct"))
    val p = greatest(col("base_n") / col("bt"), lit(eps))
    val q = greatest(col("cur_n") / col("ct"), lit(eps))
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("base_n"), col("cur_n"),
        round((p - q) * log(p / q), 6).as("psi_contrib"))
  }

  def driftPsi(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    psi(src.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
      src.filter(col("doc_id") % 2 =!= 0).select(col("n_chars")),
      "n_chars")
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
