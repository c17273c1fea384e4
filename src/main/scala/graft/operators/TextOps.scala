package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions => T}
import graft.sources.Tables.table

/** Text-analysis queries over the `documents` table — the language-ID,
  * quality-scoring, token-counting, and fingerprinting passes a training
  * -data pipeline runs before filtering/dedup. All per-row, shuffle-free,
  * codegen'd: at 100 TB these run at parquet-scan speed.
  */
object TextOps {

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in")

  /** Structural token statistics per document (oracle-checked). */
  def textStats(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"),
      col("n_chars"),
      length(col("text")).as("len_chars"),
      T.tokenCount(col("text")).as("n_tokens"),
      T.bpeTokenCount(col("text")).as("n_bpe_tokens"),
      T.uniqueTokenRatio(col("text")).as("uniq_ratio"),
      T.avgTokenLength(col("text")).as("avg_token_len"))

  /** Quality scoring + keep/drop verdict (oracle-checked). */
  def textQuality(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"),
      T.punctRatio(col("text")).as("punct_ratio"),
      T.stopwordRatio(col("text"), stopwords).as("stop_ratio"),
      T.qualityScore(col("text"), stopwords).as("quality"),
      (T.qualityScore(col("text"), stopwords) > 0.5).as("keep"))

  /** Language-ID heuristic vs the labeled lang column (oracle-checked:
    * the marker-count argmax mirrors to DuckDB as list_filter counts +
    * list_max over (score, lang) structs — struct comparison is
    * field-lexicographic in both engines, so ties break identically).
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      T.langId(col("text")).as("lang_pred"))

  /** Rolling-hash fingerprints via the custom codegen'd Catalyst
    * expressions (RabinFingerprint/RabinWinnow) + dedup verdict by exact
    * fingerprint collision.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    table(s, dir, "documents")
      .select(col("doc_id"), expr("rabin_fingerprint(text)").as("fp"),
        size(expr("rabin_winnow(text)")).as("n_winnow"))
      .withColumn("first_doc", first(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("first_doc"))
  }
}
