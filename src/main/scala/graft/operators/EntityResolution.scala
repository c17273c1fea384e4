package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.table

/** Fuzzy-matching / record-linkage operators: approximate string joins
  * via q-gram blocking + edit-distance verify — the entity-resolution
  * primitive (catalog reconciliation, near-key joins on dirty ingest)
  * that no equality join can express. North-star scope (the reference
  * joins nothing at all — SURVEY.md §2.3).
  *
  * Scale shape: a naive fuzzy join is O(|probe| x |catalog|) with a
  * non-sargable predicate — unrunnable at 100 TB. The standard fix is
  * q-gram blocking: two strings within edit distance k MUST share at
  * least one q-gram when max(len) - q*k >= q (a deletion/substitution
  * destroys at most q q-grams), so candidate pairs = equi-join on shared
  * 3-grams — a plain shuffle-on-key join — and the expensive
  * levenshtein verify runs only on candidates. Degenerate grams (shared
  * by too many catalog entries) are capped the same way every dedup
  * blocker in this repo caps buckets, mirrored in the oracle.
  */
object EntityResolution {

  /** q-gram width for blocking. */
  val GramQ = 3

  /** A gram held by more than this many catalog entities is a stop-gram
    * and generates no candidates (the IDF cut every blocking scheme
    * needs; recall survives because ED<=2 strings share many grams).
    */
  val MaxGramBlock = 20

  /** Edit-distance acceptance threshold for a verified match. */
  val MaxEdit = 2

  /** Probe-selection threshold on the md5 coin (~15% of parts). */
  val ProbeThreshold = "26666666"

  /** Positional q-grams of a string as (gram) rows, deduplicated. */
  private def grams(name: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(name) - (GramQ - 1), lit(1))),
      i => substring(name, i, lit(GramQ))))

  /** Fuzzy entity match (oracle-checked): a deterministic ~15% slice of
    * part rows becomes the dirty probe stream — each probe name gets one
    * character deleted at position p_partkey % len (a reproducible
    * corruption, so the whole query is hash-checkable) — and is linked
    * back against the catalog of distinct part names by shared-3-gram
    * blocking + levenshtein verify, keeping each probe's best match
    * (min distance, then name) within [[MaxEdit]].
    *
    * At 100 TB the probe stream is the corpus and the catalog the
    * entity dictionary: grams of both sides shuffle on the gram key
    * (catalog-side stop-grams capped via one window), the verify runs
    * per candidate pair, and the best-match window partitions by probe
    * — nothing is ever quadratic and nothing corpus-sized broadcasts.
    */
  def fuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val parts = table(s, dir, "part")
    val catalog = parts.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("cat_id"))
      .select(col("cat_id"), col("p_name").as("cat_name"))
    val probes = parts
      .filter(substring(md5(concat(lit("fz:"),
        col("p_partkey").cast("string"))), 1, 8) < ProbeThreshold)
      .select(col("p_partkey").as("probe_id"),
        expr(s"concat(substring(p_name, 1, CAST(p_partkey % length(p_name) AS INT)), " +
          "substring(p_name, CAST(p_partkey % length(p_name) AS INT) + 2))")
          .as("probe_name"))
    val catGrams = catalog
      .select(col("cat_id"), col("cat_name"), explode(grams(col("cat_name"))).as("gram"))
      .withColumn("_gn", count(lit(1)).over(
        Window.partitionBy(col("gram"))))
      .filter(col("_gn") <= MaxGramBlock).drop("_gn")
    val probeGrams = probes
      .select(col("probe_id"), col("probe_name"),
        explode(grams(col("probe_name"))).as("gram"))
    val cand = probeGrams.join(catGrams, "gram")
      .select(col("probe_id"), col("probe_name"),
        col("cat_id"), col("cat_name")).distinct()
    val scored = cand
      .withColumn("lev",
        levenshtein(col("probe_name"), col("cat_name")).cast("long"))
      .filter(col("lev") <= MaxEdit)
    val best = scored
      .withColumn("_rk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("lev"), col("cat_name"))))
      .filter(col("_rk") === 1).drop("_rk")
    probes.join(best.select(col("probe_id"), col("cat_id"),
        col("cat_name").as("match_name"), col("lev")),
        Seq("probe_id"), "left")
      .select(col("probe_id"), col("probe_name"), col("match_name"),
        col("lev"), col("match_name").isNotNull.as("matched"))
  }
}
