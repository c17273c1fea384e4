package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational.dsum
import graft.sources.Tables.table

/** Skew-handling operators (SURVEY.md §7.3 step 7). AQE's skew-join
  * splitting handles most cases at runtime; these are the explicit
  * formulations for when the plan must be skew-proof by construction —
  * e.g., one hot key holding 10% of 100 TB. Both produce results
  * IDENTICAL to their naive counterparts, so both carry full DuckDB
  * oracles written against the plain formulation.
  */
object Skew {

  val Salts = 8

  /** Salted inner join: the (potentially skewed) big side gets a random
    * salt in [0, Salts); the small side is replicated once per salt value;
    * the join key becomes (key, salt), splitting each hot key's rows
    * across Salts reducers. Salt values don't affect the result, only the
    * partitioning.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String): DataFrame = {
    val salted = big.withColumn("_salt",
      floor(rand(42) * Salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(lit((0 until Salts).toArray)))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** lineitem ⋈ supplier with salting (oracle: the plain join). */
  def joinSalted(s: SparkSession, dir: String): DataFrame =
    saltedJoin(table(s, dir, "lineitem"), table(s, dir, "supplier"),
      "l_suppkey", "s_suppkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("s_name"), col("l_quantity"))

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt) —
    * splitting any hot key across reducers — then final merge on key.
    * Decimal sums re-merge exactly, so the result is bit-identical to the
    * single-phase plan (oracle: plain GROUP BY).
    */
  def aggTwoPhase(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .withColumn("_salt", floor(rand(7) * Salts).cast("int"))
      .groupBy(col("l_returnflag"), col("_salt"))
      .agg(sum(col("l_quantity")).as("pq"),
        sum(col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2))).as("pp"),
        count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pq")).as("sum_qty"),
        sum(col("pp")).cast("double").as("sum_price"),
        sum(col("pn")).as("n"))

  /** Key-skew diagnostics (oracle-checked): the profile you run BEFORE
    * choosing a join strategy at 100 TB — per candidate join key, the
    * distinct-key count, the heaviest key and its share of all rows,
    * and count percentiles. A top-share near 1/parallelism or above
    * means the plain shuffle join stalls on one reducer and
    * [[saltedJoin]]/AQE skew splitting is warranted; the reference has
    * no planner statistics at all (SURVEY §4.2).
    *
    * Shape: per-key counts (map-side combine, key cardinality grows
    * with data) then a percentile aggregate per key COLUMN — output is
    * one row per profiled column. min_by/arg-min tie-break on the key
    * value keeps the heaviest-key column deterministic.
    */
  val SkewKeyCols: Seq[String] = Seq("l_suppkey", "l_partkey", "l_orderkey")

  def skewDiagnose(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    // ONE scan of the fact table profiles every key column: each row
    // explodes to (key_col, key) pairs, so the per-key counts for all
    // columns ride a single shuffle (a per-column loop would re-read
    // the 100 TB fact table once per key). The lexicographic struct max
    // is the arg-max on count with the LOWEST key as the deterministic
    // tie-break (keys are non-negative, so -k orders them reversed).
    val keyed = li.select(explode(array(SkewKeyCols.map(c =>
        struct(lit(c).as("key_col"), col(c).cast("long").as("k"))): _*))
      .as("e"))
      .select(col("e.key_col").as("key_col"), col("e.k").as("k"))
    keyed.groupBy(col("key_col"), col("k"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("key_col"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(struct(col("c").as("c"), (-col("k")).as("nk"))).as("m"),
        round(expr("percentile(c, 0.5)"), 4).as("p50_cnt"),
        round(expr("percentile(c, 0.99)"), 4).as("p99_cnt"))
      .select(col("key_col"), col("n_keys"), col("n_rows"),
        col("m.c").as("max_cnt"), (-col("m.nk")).as("top_key"),
        round(col("m.c").cast("double") / col("n_rows").cast("double"),
          6).as("top_share"),
        col("p50_cnt"), col("p99_cnt"))
  }
}
