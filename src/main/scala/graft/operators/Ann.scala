package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.{VectorFunctions => V}
import graft.sources.Tables.table

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths, per the north star: exact brute-force cosine top-k as the
  * correctness baseline (oracle-checked against DuckDB), and a
  * random-hyperplane LSH bucketed variant as the scale path — at 100 TB the
  * bucket join touches ~1/2^bits of the corpus per query instead of all of
  * it, trading bounded recall for a candidate set that fits a shuffle.
  */
object Ann {

  val K = 10

  /** Deterministic hyperplanes (fixed seed — no runtime randomness, so
    * results are reproducible across runs/clusters).
    */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Exact brute-force cosine top-k for query vectors (vec_id < 10) against
    * the whole corpus (oracle-checked). The small query side is broadcast,
    * so the big side streams once with no shuffle; ranking shuffles only
    * (corpus x nQueries) rows. Rank key is round(cos, 6) + vec_id so the
    * ordering is reproducible cross-engine.
    */
  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = table(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_r").desc, col("cand_id").asc)
    c.join(broadcast(q), col("q_id") =!= col("cand_id"))
      .withColumn("cos_r", round(V.cosine(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("cand_id"), col("cos_r"))
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to one of nCentroids cells; each query probes only its nProbe
    * nearest cells and re-ranks candidates by exact cosine. Rows-only
    * check (KMeans assignment has no SQL oracle); PipelineSpec bounds
    * recall against the exact baseline.
    *
    * Scale shape: the quantizer fits on a bounded deterministic sample
    * (never the full corpus), assignments are one codegen'd pass, probe
    * assignment is computed IN THE PLAN (centroid matrix broadcast as a
    * literal — it's nCentroids x dim doubles), and the probe join touches
    * ~nProbe/nCentroids of the corpus per query. Nothing per-vector ever
    * reaches the driver, so the query set may itself be a table.
    */

  /** KMeans fit-sample cap: the quantizer sees at most this many vectors.
    * Centroid quality converges long before this; the fit must not scale
    * with the corpus.
    */
  val FitSampleMax = 100000L

  def annIvf(s: SparkSession, dir: String, nCentroids: Int = 16,
             nProbe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = table(s, dir, "embeddings")
      .withColumn("vec", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("vec").setPredictionCol("cell")
    // this count prunes to zero columns (parquet row counting, near
    // metadata speed) and buys the right sample fraction — far cheaper
    // than the 5 full KMeans passes an unsampled fit would cost
    val corpusN = e.count()
    val fitSet = if (corpusN <= FitSampleMax) e
      else e.sample(withReplacement = false,
        FitSampleMax.toDouble / corpusN, seed = 42L)
    val fitted = model.fit(fitSet)
    val assigned = fitted.transform(e)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val centroids = fitted.clusterCenters.map(_.toArray)
    // Probe assignment in the plan: explode the literal centroid matrix
    // per query row, rank cells by squared L2, keep the nProbe nearest.
    // (No .collect() of query vectors — the old driver-side loop broke as
    // soon as the query set was a table.)
    val centExpr = array(centroids.zipWithIndex.map { case (c, ci) =>
      struct(lit(ci).as("cell"), array(c.map(lit): _*).as("cv"))
    }: _*)
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("d").asc, col("cell").asc)
    val probeDf = table(s, dir, "embeddings").filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        explode(centExpr).as("ct"))
      .select(col("q_id"), col("qe"), col("ct.cell").as("cell"),
        V.l2sq(col("qe"), col("ct.cv")).as("d"))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("cell"), col("qe"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_r").desc, col("cand_id").asc)
    assigned.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("cell"))
      .join(broadcast(probeDf), Seq("cell"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos_r", round(V.cosine(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("cand_id"), col("cos_r"),
        col("cell"))
  }

  /** LSH-bucketed ANN (rows-only check): hyperplane signatures partition
    * the corpus into 2^nBits buckets; each query scans only its own bucket
    * plus the nBits 1-bit-flip neighbors (multi-probe — recovers most of
    * the recall lost at bucket boundaries for the cost of nBits+1 probes,
    * not a wider scan). Output schema matches annBruteforce plus the
    * bucket, so recall against the exact baseline is directly measurable
    * (see PipelineSpec).
    */
  def annLsh(s: SparkSession, dir: String, nBits: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val pl = planes(nBits, 64)
    val e = table(s, dir, "embeddings")
      .withColumn("bucket", V.hyperplaneBucket(col("embedding"), pl))
    val probes = array(lit(0L) +: (0 until nBits).map(j => lit(1L << j)): _*)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m)))
          .as("bucket"))
    val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
      col("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_r").desc, col("cand_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos_r", round(V.cosine(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("cand_id"), col("cos_r"),
        col("bucket"))
  }

  /** Recall@K floors each ANN path must clear against the exact
    * brute-force top-K ([[annRecall]] emits the verdicts as a
    * hash-checked query; PipelineSpec asserts the numeric values).
    *
    * Calibrated against MEASURED recall on the synthetic embeddings
    * (graft.RecallProbe, sf0.001/0.01/0.1):
    *   lsh nBits=6 (probes 7/64 buckets ~ 11% scan): 0.15 / 0.23 / 0.29
    *   ivf nProbe=2 of 16 cells (~ 12.5% scan):      0.47 / 0.41 / 0.49
    *   (ivf nProbe=4: 0.66-0.70; lsh nBits=3: 0.59-0.68 at 50% scan)
    * The synthetic vectors are weakly-clustered/near-isotropic, where ANY
    * sublinear method's recall is bounded near its scanned fraction —
    * high-recall ANN on such data requires scanning most of the corpus,
    * so these floors are regression guards at the default operating
    * points, not quality claims. IVF beats LSH ~4x per scanned byte here
    * because KMeans recovers the label-cluster structure; on real text
    * embeddings (strongly clustered) both sit far higher at the same
    * settings, and recall tunes up smoothly via nProbe / fewer bits.
    */
  val LshRecallMin = 0.1
  val IvfRecallMin = 0.3

  /** Per-method recall@K of the ANN paths vs [[annBruteforce]] — the
    * number an ANN evaluation actually reports, computed in-plan (the
    * exact and approximate top-K lists join on (q_id, cand_id); no
    * driver-side set math). Every input is seed-fixed (LSH planes and
    * KMeans are deterministic), so recall is a stable function of the
    * data and the emitted `recall_ok` verdicts are hash-checkable: the
    * oracle asserts them as literals, PipelineSpec bounds the numeric
    * values themselves.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val bf = annBruteforce(s, dir).select(col("q_id"), col("cand_id"))
    val hits = annLsh(s, dir)
      .select(lit("lsh").as("method"), col("q_id"), col("cand_id"))
      .unionByName(annIvf(s, dir)
        .select(lit("ivf").as("method"), col("q_id"), col("cand_id")))
    val nBf = bf.agg(count(lit(1)).as("n_exact"))
    hits.join(bf.withColumn("hit", lit(1)), Seq("q_id", "cand_id"), "left")
      .groupBy(col("method"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .crossJoin(broadcast(nBf))
      .select(col("method"),
        (col("n_hit").cast("double") / col("n_exact").cast("double") >=
          when(col("method") === "lsh", LshRecallMin)
            .otherwise(IvfRecallMin)).as("recall_ok"))
  }

  /** Symmetric int8 quantization of the embedding column (oracle-checked)
    * — the standard 4x storage/bandwidth cut before an ANN index is
    * built or embeddings ship to a serving tier. Per-vector max-abs
    * scaling: q_i = round_half_up(x_i * 127 / max|x|); the half-up
    * rounding is spelled floor(x + 0.5) so both engines round identical
    * doubles identically (their native round() functions disagree on
    * negative halves). Per-row, shuffle-free — runs at scan speed; the
    * quantized vector is emitted as a canonical comma string (the
    * driver's oracle harness hashes scalars, not arrays).
    */
  def quantizeEmbeddings(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "embeddings")
      .withColumn("qmax",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("scale",
        when(col("qmax") === 0.0, lit(0.0)).otherwise(lit(127.0) / col("qmax")))
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * col("scale") + 0.5).cast("int")))
      .withColumn("max_err", when(col("scale") === 0.0, lit(0.0)).otherwise(
        array_max(zip_with(col("embedding"), col("q"),
          (x, q) => abs(x.cast("double") - q.cast("double") / col("scale"))))))
      .select(col("vec_id"), col("label"),
        round(col("scale"), 6).as("scale"),
        array_join(transform(col("q"), q => q.cast("string")), ",").as("q"),
        round(col("max_err"), 5).as("max_err"))
  }

  /** Per-label embedding centroids (oracle-checked) — the vector
    * aggregation behind SemDeDup-style semantic clustering, IVF coarse
    * quantizer refresh, and per-source drift monitoring. One posexplode
    * to (label, dim, v) then a (label, dim)-keyed aggregate: at 100 TB
    * this is a single shuffle whose key cardinality is
    * |labels| * dims — always small — with full map-side partial
    * aggregation; no vector ever concatenates driver-side.
    *
    * Cross-engine device: component sums go through DECIMAL(25,7)
    * (float32 carries <= 7 significant decimal digits, so the cast is
    * exact-enough to agree between engines and decimal addition is
    * order-independent — the Relational.dsum money trick applied to
    * vectors). The emitted value is the SUM (exactly representable:
    * scale-7 decimals of unit-range floats cast to double without
    * rounding), not a rounded mean — dividing first and rounding after
    * lands on round-half boundaries that double rounding resolves
    * differently per engine; sum+count is boundary-free AND the
    * partial-aggregate form a consumer merges anyway (mean = sum/n).
    */
  def embeddingCentroids(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        // float -> STRING -> decimal: both engines print the shortest
        // round-trip decimal for a float32 and parse it identically, so
        // the scale-7 value is bit-agreed; a direct float->decimal cast
        // goes through each engine's own double expansion and diverges
        // in the 7th place
        sum(col("v").cast("string").cast(DecimalType(25, 7)))
          .cast("double").as("sum_v"))
}
