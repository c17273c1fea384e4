package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAggregator
import graft.operators.{Curation, Dedup, TextOps}

/** Invariants for the round-6 wave-4 operators: per-domain caps, weighted
  * sampling, winsorized scaling, content-defined chunking, and the
  * Misra–Gries frequency sketch. Cross-engine value equality is the
  * DuckDB oracle gate's job; these pin the structural contracts.
  */
class Wave4Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("misra-gries: estimates never exceed truth and undercount is " +
       "bounded by N/(cap+1) over arbitrary merge trees") {
    val cap = 4
    val agg = new MisraGriesAggregator(cap)
    // skewed stream: a^40 b^20 c^10 + 30 singletons, interleaved
    val items = (Seq.fill(40)("a") ++ Seq.fill(20)("b") ++
      Seq.fill(10)("c") ++ (1 to 30).map(i => s"x$i"))
    val shuffled = new scala.util.Random(7).shuffle(items)
    val n = shuffled.length.toLong
    val truth = shuffled.groupBy(identity).view.mapValues(_.length.toLong)

    // exercise a nontrivial merge tree: 7 uneven chunks, pairwise-merged
    val chunks = shuffled.grouped(17).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val sketch = chunks.reduce(agg.merge)
    assert(sketch.size <= cap)
    for ((k, est) <- sketch) {
      val t = truth(k)
      assert(est <= t, s"$k overestimated: $est > $t")
      assert(t - est <= n / (cap + 1),
        s"$k undercount ${t - est} exceeds ${n / (cap + 1)}")
    }
    // the guarantee also covers ABSENT keys: truth <= N/(cap+1) for any
    // key the sketch dropped
    for ((k, t) <- truth if !sketch.contains(k))
      assert(t <= n / (cap + 1), s"dropped $k with count $t")
    // the heavy hitter must survive: 40 > 100/5
    assert(sketch.contains("a"))
  }

  test("sketch_freq: verdict true for every exact-top-k token") {
    val r = TextOps.sketchFreq(spark, dir).collect()
    assert(r.length === TextOps.MgTopK)
    assert(r.forall(_.getBoolean(2)), "MG bound violated")
    // exact counts non-increasing, ties by token asc
    r.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        val (ca, cb) = (a.getLong(1), b.getLong(1))
        assert(ca > cb || (ca == cb && a.getString(0) < b.getString(0)))
      case _ =>
    }
  }

  test("domain_cap: no source exceeds K and ranks are 1..n_kept") {
    val r = Curation.domainCap(spark, dir).collect()
    val bySrc = r.groupBy(_.getString(1))
    assert(bySrc.nonEmpty)
    for ((_, rows) <- bySrc) {
      assert(rows.length <= Curation.DomainCapK)
      assert(rows.map(_.getLong(2)).sorted.toSeq ===
        (1L to rows.length).toSeq)
    }
    // kept docs are distinct
    assert(r.map(_.getLong(0)).distinct.length === r.length)
  }

  test("weighted_sample: exactly k distinct docs, keys positive, and the " +
       "worst kept key beats every rejected key") {
    val out = Curation.weightedSample(spark, dir)
    val r = out.collect()
    assert(r.length === Curation.WeightedSampleK)
    assert(r.map(_.getLong(0)).distinct.length === r.length)
    assert(r.forall(_.getDouble(2) > 0.0))
    val maxKept = r.map(_.getDouble(2)).max
    // recompute the race key for the full table: no rejected doc may
    // have a strictly smaller key than the kept maximum
    val all = Curation.weightedSample(spark, dir, k = Int.MaxValue)
      .collect()
    val kept = r.map(_.getLong(0)).toSet
    val betterRejected = all.filter(x =>
      !kept.contains(x.getLong(0)) && x.getDouble(2) < maxKept)
    assert(betterRejected.isEmpty)
  }

  test("winsorize: w_score in [0,1], every scored doc present, and at " +
       "least one doc clamps at each end per language") {
    val r = Curation.winsorizeScores(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(r.length === n)
    assert(r.forall { x =>
      val w = x.getDouble(3); w >= 0.0 && w <= 1.0
    })
    // non-degenerate languages hit both ends of the band (5% tails
    // clamp to exactly 0 and 1)
    val byLang = r.groupBy(_.getString(1))
    for ((_, rows) <- byLang if rows.length >= 40) {
      assert(rows.exists(_.getDouble(3) == 0.0))
      assert(rows.exists(_.getDouble(3) == 1.0))
    }
  }

  test("cdc chunks: report bounded, all duplicated, edit-locality holds") {
    val r = Dedup.cdcChunks(spark, dir).collect()
    assert(r.length <= Dedup.CdcTopN)
    assert(r.forall(_.getLong(2) > 1L))
    assert(r.map(_.getString(0)).distinct.length === r.length)
    // the CDC property itself: chunking is content-defined, so a
    // prefix insertion shifts only the first chunk boundary — chunk
    // the same token stream with and without a prefix and require the
    // chunk multisets to agree except near the edit
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    val edited = "INSERTED " + base
    def chunksOf(text: String): Seq[String] = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val toks = df.select(col("doc_id"),
        posexplode(T.tokens(col("text"))).as(Seq("pos", "tok")))
      val withB = toks.withColumn("b",
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          % Dedup.CdcDivisor === 0).cast("int"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      withB.withColumn("chunk_id", sum(col("b")).over(w))
        .groupBy(col("chunk_id"))
        .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("chunk_text"))
        .orderBy(col("chunk_id"))
        .collect().map(_.getString(1)).toSeq
    }
    val (c1, c2) = (chunksOf(base), chunksOf(edited))
    // all chunks after the first boundary-crossing one are identical
    assert(c2.drop(c2.length - (c1.length - 1)) === c1.drop(1) ||
      c2.tail === c1 || c2.tail === c1.tail,
      s"edit did not stay local: $c1 vs $c2")
  }

  test("cdc_chunk_texts equals the exploded running-sum formulation, " +
       "chunk for chunk over the corpus (the in-row chunker is invisible)") {
    import graft.functions.{TextFunctions => T}
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val inRow = docs.select(col("doc_id"),
      explode(call_function("cdc_chunk_texts",
        T.tokens(col("text")), lit(Dedup.CdcDivisor))).as("chunk_text"))
    val toks = docs.select(col("doc_id"),
      posexplode(T.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val exploded = toks.withColumn("b",
      (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
        % Dedup.CdcDivisor === 0).cast("int"))
      .withColumn("chunk_id", sum(col("b")).over(w))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok"))).as("chunk_text"))
      .select(col("doc_id"), col("chunk_text"))
    assert(inRow.exceptAll(exploded).count() === 0L)
    assert(exploded.exceptAll(inRow).count() === 0L)
  }
}
