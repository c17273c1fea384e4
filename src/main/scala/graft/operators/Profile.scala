package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.table

/** Table profiling: the per-column statistics pass (row count, null
  * count, exact distinct count, min/max) every warehouse runs before
  * trusting a new feed — the data-quality surface beside the per-KEY
  * statistics of [[Skew.skewDiagnose]]. The reference has no statistics
  * collection at all (SURVEY §4.2).
  */
object Profile {

  /** Columns profiled by [[profileTable]] — a heterogeneous set (id,
    * foreign key, money, date, low-cardinality enum) so the one query
    * exercises every stat over every shape.
    */
  val ProfileCols: Seq[String] =
    Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
      "o_orderpriority")

  /** Reporting type per column where the native one does not render
    * identically across engines: DOUBLE's shortest-round-trip string
    * differs (Spark "1.0E7" vs DuckDB "10000000.0"), so money min/max
    * go through the DECIMAL(18,2) device (`Relational.dsum`) whose
    * fixed-scale rendering is engine-agreed. BIGINT/TIMESTAMP/VARCHAR
    * render identically as-is.
    */
  val MinMaxCast: Map[String, String] = Map("o_totalprice" -> "DECIMAL(18,2)")

  /** Per-column table profile (oracle-checked): one row per column with
    * (n_rows, n_null, n_distinct, min_s, max_s). min/max are computed on
    * the NATIVE type (numeric/date ordering, not lexicographic) and cast
    * to string only for the uniform report schema; DECIMAL money renders
    * with its fixed scale in both engines.
    *
    * Scale shape: ONE scan. Spark plans the k exact count(DISTINCT)
    * aggregates via a single Expand (each input row fans to k
    * single-column rows — total bytes ≈ one row's worth per column, the
    * same data the scan already read) with map-side partial aggregation;
    * there is no per-column rescan and nothing driver-side. The row
    * count and per-column null/min/max ride the same pass. Exactness is
    * the point (the profile is a CONTRACT check); the sketch alternative
    * for ndv-only at lower cost is `sketch_merge`'s mergeable HLL.
    * The k-row result unpivots via one stack() projection.
    */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    // Spread before the Expand: the k exact count(DISTINCT)s fan every
    // input row k+1 ways into the partial aggregate, so this is the
    // CPU-heavy stage the single-split trap serializes (the whole
    // Expand+partial-agg ran in one task at the bench SFs — measured
    // ~3.0 s median, the fleet's #3 query, for a 150k-row table).
    // Engine-guarded: a production multi-split scan passes through
    // with no exchange (Partitioning.spreadIfNarrow). Every aggregate
    // here is exact and order-insensitive (count/min/max/distinct), so
    // the spread is result-invariant.
    val plain = table(s, dir, "orders")
    val src = graft.engine.Partitioning.spreadIfNarrow(s, plain,
      s"$dir/orders.parquet")
    // min/max on a STRING column cannot live in the Expand aggregate:
    // a string aggregation buffer is not hash-aggregatable, and ONE
    // such function demotes the whole aggregate — Expand and all — to
    // SortAggregate, which pays a full sort of the k+1-way-expanded
    // table on the 6-part grouping key (the r21 stage profile measured
    // that sort as most of this query). String columns take their
    // min/max in a separate GROUPING-FREE fold instead (SortAggregate
    // with no grouping needs no sort — one streaming pass at scan
    // speed) and re-attach as a broadcast 1-row frame; everything
    // hash-friendly (counts, exact ndv via Expand, numeric/date
    // min/max) stays in the single Expand pass, which now plans as
    // HashAggregate.
    val isStr: String => Boolean =
      c => plain.schema(c).dataType == org.apache.spark.sql.types.StringType
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: ProfileCols.flatMap {
      c =>
        val mm = MinMaxCast.get(c).fold(col(c))(t => col(c).cast(t))
        Seq(count(col(c)).as(s"_cnt_$c"),
          countDistinct(col(c)).as(s"_ndv_$c")) ++
          (if (isStr(c)) Nil
           else Seq(min(mm).cast("string").as(s"_min_$c"),
             max(mm).cast("string").as(s"_max_$c")))
    }
    val strAggs: Seq[Column] = ProfileCols.filter(isStr).flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one0 = src.agg(aggs.head, aggs.tail: _*)
    val one =
      if (strAggs.isEmpty) one0
      else one0.crossJoin(broadcast(
        plain.agg(strAggs.head, strAggs.tail: _*)))
    val stacked = ProfileCols.map { c =>
      s"'$c', _n - _cnt_$c, _ndv_$c, _min_$c, _max_$c"
    }.mkString(", ")
    one.select(col("_n").as("n_rows"),
        expr(s"stack(${ProfileCols.length}, $stacked)")
          .as(Seq("col_name", "n_null", "n_distinct", "min_s", "max_s")))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Decile count for [[histogramEquidepth]]. */
  val HistBuckets = 10
  def histCuts: Seq[Double] = (1 until HistBuckets).map(_ / 10.0)

  /** Equi-depth histogram (oracle-checked): per return flag, rows ranked
    * by `ntile(10)` over a DETERMINISTIC total order (price, then the
    * unique (l_orderkey, l_linenumber) tiebreak), then per-bucket count
    * and DECIMAL-rendered lo/hi. Equi-depth, not equi-width: every
    * bucket holds exactly ⌈n/10⌉ or ⌊n/10⌋ rows no matter how skewed the
    * distribution — the histogram an optimizer or drift monitor actually
    * wants (equi-width buckets collapse under skew). Completes the
    * statistics surface: [[profileTable]] per-column scalars,
    * [[Skew.skewDiagnose]] per-key, this per-distribution.
    *
    * Why ntile and not a percentile fit: the standard SQL ntile bucket
    * rule (first n mod k buckets take the extra row) over a unique
    * ordering is engine-agreed with NO floating-point boundary at all —
    * Spark and DuckDB assign every row the same bucket by construction,
    * under any execution sequencing. The previous formulation fitted
    * percentile boundaries and compiled them in as literals, which was
    * bit-exact in isolation but coupled the oracle to JVM fit state
    * ([[histogramEquidepthFitted]] keeps that shape as the documented
    * at-scale variant).
    *
    * Scale shape: one hash exchange on l_returnflag, then a sort within
    * each flag partition for the window — the ORDER BY sort any
    * windowed rank pays. Per-flag data must fit a partition's sort
    * spill budget; at 100 TB with few flags that is real pressure, and
    * [[histogramEquidepthFitted]] is the scan-speed alternative
    * (bounded percentile fit + literal assignment, no sort) whose
    * boundaries are approximate-but-tunable instead of exact-count.
    */
  def histogramEquidepth(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))
    table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(HistBuckets).over(w).cast("long"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(min(col("l_extendedprice")).cast("decimal(18,2)").cast("double")
          .as("lo"),
        max(col("l_extendedprice")).cast("decimal(18,2)").cast("double")
          .as("hi"),
        count(lit(1)).as("n"))
  }

  /** DuckDB mirror of [[histogramEquidepth]] — the identical ntile over
    * the identical unique ordering; static SQL, no fit state.
    *
    * lo/hi take the DECIMAL(18,2)→DOUBLE round-trip on BOTH sides (the
    * q1_agg device): the decimal rounding pins the value to two places
    * the engines agree on, and the final DOUBLE cast keeps any
    * decimal-typed object out of the output schema — harnesses that
    * read the two sides through different libraries (pyarrow Decimal
    * vs duckdb float64) hash decimal reprs differently even when the
    * values are identical.
    */
  def histogramEquidepthOracleSql: String = s"""
      WITH a AS (
        SELECT l_returnflag, l_extendedprice,
          ntile($HistBuckets) OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
        FROM lineitem)
      SELECT l_returnflag, bucket,
        CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE) AS lo,
        CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE) AS hi,
        count(*) AS n
      FROM a GROUP BY l_returnflag, bucket"""

  /** The at-scale equi-depth variant (spec-checked, not oracle-gated):
    * per-flag decile boundaries fitted EXACTLY once (a |flags|-row
    * collect — the IVF-centroid fit shape), then every row assigned by
    * counting fitted boundaries strictly below its value as codegen'd
    * literal arithmetic at scan speed — no sort, no window, no join.
    * This is the shape to prefer when per-flag row counts exceed a
    * partition's sort budget; its buckets are ~10% ±boundary-tie mass
    * rather than [[histogramEquidepth]]'s exact ⌈n/10⌉/⌊n/10⌋.
    */
  def histogramEquidepthFitted(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val fit: Seq[(String, Seq[Double])] = src
      .groupBy(col("l_returnflag"))
      .agg(expr(s"percentile(l_extendedprice, " +
        s"array(${histCuts.mkString(", ")}))").as("bs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
      .toSeq.sortBy(_._1)
    val bs = fit.tail.foldLeft(
      when(col("l_returnflag") === fit.head._1,
        array(fit.head._2.map(lit): _*))) { case (acc, (f, b)) =>
      acc.when(col("l_returnflag") === f, array(b.map(lit): _*))
    }
    src.withColumn("bucket", aggregate(bs, lit(0), (acc, b) =>
        acc + when(col("l_extendedprice") > b, 1).otherwise(0))
        .cast("long"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(min(col("l_extendedprice")).cast("decimal(18,2)").cast("double")
          .as("lo"),
        max(col("l_extendedprice")).cast("decimal(18,2)").cast("double")
          .as("hi"),
        count(lit(1)).as("n"))
  }

  /** Per-key audit record emitted by [[cogroupAudit]]. */
  case class KeyAudit(okey: Long, has_order: Boolean, n_lines: Long,
                      status: String)

  /** Referential-integrity audit via the typed Dataset cogroup
    * (oracle-checked): orders and lineitem co-grouped by order key, one
    * audit row per key on either side — `ok` (both present), `orphan`
    * (lines without their order), `childless` (order without lines).
    * The feed-corruption check every ingest runs; both failure classes
    * are exercised by deterministic md5-coin carves (the fuzzy_join
    * probe device) that drop ~1/16 of each side.
    *
    * Why cogroup and not join+groupBy: ONE co-partitioned exchange per
    * side and a single streaming pass per key — no intermediate
    * order x line join rows materialize just to be re-aggregated. This
    * is also the remaining typed-API surface (KeyValueGroupedDataset
    * .cogroup) next to Aggregator (`agg_topk_udaf`) and
    * flatMapGroupsWithState (streaming).
    */
  def cogroupAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = table(s, dir, "orders")
      .filter(substring(md5(concat(lit("oc:"),
        col("o_orderkey").cast("string"))), 1, 1) =!= "0")
      .select(col("o_orderkey")).as[Long]
      .groupByKey(identity)
    val lines = table(s, dir, "lineitem")
      .filter(substring(md5(concat(lit("lc:"),
        col("l_orderkey").cast("string"))), 1, 1) =!= "f")
      .select(col("l_orderkey")).as[Long]
      .groupByKey(identity)
    orders.cogroup(lines) { (k, os, ls) =>
      val hasOrder = os.nonEmpty
      val nLines = ls.size.toLong
      val status =
        if (hasOrder && nLines > 0L) "ok"
        else if (hasOrder) "childless"
        else "orphan"
      Iterator(KeyAudit(k, hasOrder, nLines, status))
    }.toDF()
  }

  def cogroupAuditOracleSql: String = """
      WITH o AS (
        SELECT o_orderkey FROM orders
        WHERE substr(md5('oc:' || CAST(o_orderkey AS VARCHAR)), 1, 1)
          <> '0'),
      l AS (
        SELECT l_orderkey, count(*) AS n FROM lineitem
        WHERE substr(md5('lc:' || CAST(l_orderkey AS VARCHAR)), 1, 1)
          <> 'f'
        GROUP BY l_orderkey)
      SELECT coalesce(o.o_orderkey, l.l_orderkey) AS okey,
        o.o_orderkey IS NOT NULL AS has_order,
        coalesce(l.n, 0) AS n_lines,
        CASE WHEN o.o_orderkey IS NOT NULL AND coalesce(l.n, 0) > 0
               THEN 'ok'
             WHEN o.o_orderkey IS NOT NULL THEN 'childless'
             ELSE 'orphan' END AS status
      FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey"""

  /** DuckDB mirror: per-column scalar aggregates unioned — the engines
    * agree because every stat is exact integer/native-ordered.
    */
  def profileTableOracleSql: String =
    ProfileCols.map { c =>
      val mm = MinMaxCast.get(c).fold(c)(t => s"CAST($c AS $t)")
      s"""SELECT '$c' AS col_name,
        count(*) AS n_rows,
        count(*) - count($c) AS n_null,
        count(DISTINCT $c) AS n_distinct,
        CAST(min($mm) AS VARCHAR) AS min_s,
        CAST(max($mm) AS VARCHAR) AS max_s
      FROM orders"""
    }.mkString("\nUNION ALL\n")
}
