package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.sources.Tables.table

/** Term-statistics ranking and scoring over the `documents` table —
  * TF-IDF keyterm extraction, BM25 retrieval, and unigram-LM
  * log-likelihood quality scoring (the classic KenLM-style corpus filter,
  * here with the simplest possible LM). All three are fully
  * SQL-expressible, so each is hash-checked against the DuckDB oracle.
  *
  * Common scale shape: one token-explode pass over the corpus feeding
  * hash aggregates with map-side partial combine; the derived term
  * statistics (document frequencies, corpus totals) are VOCAB-sized, not
  * corpus-sized, so they broadcast back onto the streaming side — the
  * corpus itself is never joined shuffle-to-shuffle against anything its
  * own size.
  *
  * Cross-engine float discipline: scores are rounded (4 or 3 decimals)
  * AFTER ranking, and every cross-row double sum either has a fixed
  * written order (BM25's per-term columns) or is quantized far above
  * accumulated-ulp noise (unigram avg at 1e-3) — the same precision
  * rules the rest of the oracle surface uses.
  */
object Ranking {

  private def toksOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))

  /** Top-k TF-IDF terms per document (oracle-checked). idf uses the
    * smooth formulation ln((N+1)/(df+1)) + 1, so terms present in every
    * document still score positively and ordering is total.
    */
  def tfIdfTopTerms(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = table(s, dir, "documents")
    val tf = toksOf(docs)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df via a window count over the tf frame (one row per (doc, term),
    // so rows-per-term = document frequency) — the capBuckets pattern:
    // keeps the expensive tokenize+aggregate pass SINGLE-consumer (a
    // groupBy+join formulation computes it twice) and never broadcasts
    // the vocab-sized df table, which at web scale is NOT small. n_docs
    // is a column-pruned metadata count — broadcast as one row.
    val wdf = Window.partitionBy(col("term"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(wdf))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        (log((col("n_docs").cast("double") + 1.0) /
          (col("df").cast("double") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("score"), 4).as("score"))
  }

  /** Default BM25 query terms — chosen to hit the synthetic corpus. */
  val Bm25Query: Seq[String] = Seq("data", "model", "system")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 retrieval: top-k documents for a bag of query terms
    * (oracle-checked). Tokens are filtered to the query terms BEFORE the
    * tf aggregate, so the shuffled volume is per-query-term, not
    * corpus-wide; document length comes from the per-row codegen'd token
    * counter, and avgdl/N are exact integer-sum statistics. The per-term
    * partial scores are summed in FIXED written order (one conditional
    * aggregate per query term) so the double addition order — and hence
    * the hash — is engine-independent.
    */
  def bm25Search(s: SparkSession, dir: String,
                 query: Seq[String] = Bm25Query, k: Int = 100): DataFrame = {
    val docs = table(s, dir, "documents")
    val base = docs.select(col("doc_id"),
      T.tokenCount(col("text")).cast("long").as("dl"),
      T.tokens(col("text")).as("toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(query))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df via window count over tf (see tfIdfTopTerms) — single consumer
    // of the filtered-token aggregate
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5) + 1.0))
      .withColumn("sc", col("idf") * col("tf").cast("double") * (Bm25K1 + 1.0) /
        (col("tf").cast("double") + lit(Bm25K1) *
          (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl").cast("double") /
            col("avgdl"))))
    val perTerm: Seq[Column] = query.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("sc"))), lit(0.0)).as(s"s_$i")
    }
    val summed = scored.groupBy(col("doc_id"), col("dl"))
      .agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score",
        query.indices.map(i => col(s"s_$i")).reduce(_ + _))
    // Distributed top-k (TakeOrderedAndProject) FIRST, then rank the <= k
    // survivors with an unpartitioned row_number — the window's
    // single-partition funnel only ever sees k rows, never every document
    // containing a query term.
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    summed
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("dl"),
        round(col("score"), 4).as("score"))
  }

  /** Unigram-LM log-likelihood quality score (oracle-checked): the mean
    * per-token ln p(token) under the corpus unigram distribution with
    * add-one smoothing — the cheapest member of the LM-perplexity
    * quality-filter family (a KenLM n-gram model swaps in at the freq
    * table). Docs far below the corpus mean are gibberish/boilerplate
    * candidates. The frequency table is vocab-sized → broadcast; the
    * corpus streams once. avg_ll is quantized at 1e-3, far above the
    * accumulated ulp noise of the per-term double sums.
    */
  /** Bigram-LM log-likelihood (oracle-checked): mean per-bigram
    * ln p(w2|w1) with add-one smoothing — p = (c(w1 w2)+1)/(c(w1·)+V),
    * c(w1·) = corpus occurrences of bigrams starting w1, V = distinct
    * first-token vocabulary. One step up the n-gram ladder from
    * [[unigramLogLikelihood]] (the production KenLM filter is the same
    * join shape at n=5 with backoff). Bigrams are formed per row
    * (zip_with over adjacent tokens — no shuffle), both corpus counts
    * come from window sums over the single bigram-tf frame, and the
    * scalars re-aggregate that frame (exchange reuse — one corpus pass).
    */
  def bigramLogLikelihood(s: SparkSession, dir: String,
                          keepAbove: Double = -10.0): DataFrame = {
    val docs = table(s, dir, "documents")
    val bigrams = docs
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
    val tf = bigrams.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val totals = tf.agg(
      count_distinct(col("w1")).as("vocab"))
    val doc = tf
      .withColumn("cbg", sum(col("tf")).over(Window.partitionBy(col("bg"))))
      .withColumn("cw1", sum(col("tf")).over(Window.partitionBy(col("w1"))))
      .crossJoin(broadcast(totals))
      .withColumn("lp", log(
        (col("cbg").cast("double") + 1.0) /
          (col("cw1").cast("double") + col("vocab").cast("double"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf").cast("double") * col("lp")).as("ll"))
    docs.select(col("doc_id"))
      .join(doc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("ll") / col("n_bigrams").cast("double"), 3).as("avg_ll2"),
        coalesce(col("ll") / col("n_bigrams").cast("double") >= keepAbove,
          lit(false)).as("keep"))
  }

  /** Model min-count (KenLM-style pruning: singleton n-grams are not in
    * the model) and the stupid-backoff discount.
    */
  val LmMinCount = 2
  val BackoffAlpha = 0.4

  /** Trigram stupid-backoff LM log-likelihood (oracle-checked): mean
    * per-trigram ln S(w3 | w1 w2) with Brants et al. (2007) stupid
    * backoff —
    *   S = c123 / c12                    if c123 >= LmMinCount
    *     | a * c23 / c2                  else if c23 >= LmMinCount
    *     | a^2 * (c3' + 1) / (N + V)     otherwise (add-one unigram base;
    *                                     c3' = c3 if c3 >= LmMinCount else 0)
    * Pruning count-1 n-grams from the model is what makes backoff
    * actually fire on a self-scored corpus; counts nest (c12 >= c123,
    * c2 >= c23), so every denominator is present whenever its numerator
    * clears the prune and no division ever sees null.
    *
    * One more rung up the n-gram ladder from [[bigramLogLikelihood]], and
    * the full KenLM query shape: the trigram tf frame is scored against
    * its own corpus counts via a window sum (single consumer of the
    * expensive explode+aggregate), while the lower-order count tables are
    * VOCAB-sized and join back on their n-gram keys as shuffle joins —
    * nothing corpus-sized is ever broadcast.
    */
  def trigramLogLikelihood(s: SparkSession, dir: String,
                           keepAbove: Double = -12.0): DataFrame = {
    val docs = table(s, dir, "documents")
    val base = docs.select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val trigrams = base.filter(col("n") >= 3)
      .select(col("doc_id"), explode(zip_with(
        zip_with(
          slice(col("toks"), lit(1), col("n") - 2),
          slice(col("toks"), lit(2), col("n") - 2),
          (a, b) => concat_ws(" ", a, b)),
        slice(col("toks"), lit(3), col("n") - 2),
        (ab, c) => concat_ws(" ", ab, c))).as("tg"))
    val bigramCounts = base.filter(col("n") >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), col("n") - 1),
        slice(col("toks"), lit(2), col("n") - 1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val unigramCounts = base
      .select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cu"))
    val totals = unigramCounts.agg(sum(col("cu")).as("n_toks"),
      count(lit(1)).as("vocab"))
    val tf = trigrams.groupBy(col("doc_id"), col("tg"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w12", substring_index(col("tg"), " ", 2))
      .withColumn("w23", substring_index(col("tg"), " ", -2))
      .withColumn("w2", substring_index(col("w23"), " ", 1))
      .withColumn("w3", substring_index(col("tg"), " ", -1))
      // corpus trigram count via window sum — the tf frame stays the
      // single consumer of the trigram explode (see tfIdfTopTerms)
      .withColumn("ctg", sum(col("tf")).over(Window.partitionBy(col("tg"))))
    val joined = tf
      .join(bigramCounts.select(col("bg").as("w12"), col("cb").as("cb12")),
        Seq("w12"), "left")
      .join(bigramCounts.select(col("bg").as("w23"), col("cb").as("cb23")),
        Seq("w23"), "left")
      .join(unigramCounts.select(col("term").as("w2"), col("cu").as("cu2")),
        Seq("w2"), "left")
      .join(unigramCounts.select(col("term").as("w3"), col("cu").as("cu3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(totals))
    val a = lit(BackoffAlpha)
    val c23 = coalesce(col("cb23"), lit(0L))
    val c3p = when(coalesce(col("cu3"), lit(0L)) >= LmMinCount, col("cu3"))
      .otherwise(lit(0L))
    val lp =
      when(col("ctg") >= LmMinCount,
        log(col("ctg").cast("double") / col("cb12").cast("double")))
      .when(c23 >= LmMinCount,
        log(a * c23.cast("double") / col("cu2").cast("double")))
      .otherwise(log(a * a * (c3p.cast("double") + 1.0) /
        (col("n_toks").cast("double") + col("vocab").cast("double"))))
    val doc = joined
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_trigrams"),
        sum(col("tf").cast("double") * lp).as("ll"))
    docs.select(col("doc_id"))
      .join(doc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        round(col("ll") / col("n_trigrams").cast("double"), 3).as("avg_ll3"),
        coalesce(col("ll") / col("n_trigrams").cast("double") >= keepAbove,
          lit(false)).as("keep"))
  }

  def unigramLogLikelihood(s: SparkSession, dir: String,
                           keepAbove: Double = -9.0): DataFrame = {
    val docs = table(s, dir, "documents")
    val tf = toksOf(docs)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // corpus term frequency via window sum over the tf frame (see
    // tfIdfTopTerms — single consumer, no vocab-sized broadcast). The
    // two global scalars are re-aggregated FROM the tf frame: its
    // (doc_id, term) exchange is the identical subtree on both
    // consumers, so ReuseExchange re-reads the one materialized shuffle
    // instead of tokenizing the corpus a second time.
    val totals = tf.agg(sum(col("tf")).as("total_toks"),
      count_distinct(col("term")).as("vocab"))
    val doc = tf
      .withColumn("cnt", sum(col("tf")).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(totals))
      .withColumn("lp", log(
        (col("cnt").cast("double") + 1.0) /
          (col("total_toks").cast("double") + col("vocab").cast("double"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"),
        sum(col("tf").cast("double") * col("lp")).as("ll"))
    docs.select(col("doc_id"))
      .join(doc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl"),
        round(col("ll") / col("dl").cast("double"), 3).as("avg_ll"),
        coalesce(col("ll") / col("dl").cast("double") >= keepAbove,
          lit(false)).as("keep"))
  }
}
