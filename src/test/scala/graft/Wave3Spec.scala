package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Ann, Curation, Graph, Ranking, TimeSeries}

/** Invariants for the round-6 wave-3 operators: triangle counting, PMI
  * collocations, Kneser-Ney LM, time-series gap-fill, OLS fitting, and
  * the kNN graph. Cross-engine value equality is the DuckDB oracle
  * gate's job; these pin the structural contracts.
  */
class Wave3Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("triangles: counts are consistent and the coefficient is a ratio") {
    val r = Graph.graphTriangles(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    val (nodes, edges, tris, wedges) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val cc = row.getDouble(4)
    assert(nodes > 0 && edges > 0)
    // simple graph: at most n(n-1)/2 edges; multigraph emits 3n arrows
    assert(edges <= nodes * Graph.PrOutDeg)
    // every triangle closes three wedges; C = 3T/W in [0, 1]
    assert(3 * tris <= wedges)
    assert(cc >= 0.0 && cc <= 1.0)
    assert(math.abs(cc - 3.0 * tris / wedges) < 1e-6)
  }

  test("pmi: report is exactly top-k, min-count holds, rank order total") {
    val r = Ranking.collocationsPmi(spark, dir).collect()
    assert(r.length === Ranking.CollocTopK)
    assert(r.map(_.getLong(0)).toSeq === (1L to r.length))
    assert(r.forall(_.getLong(2) >= Ranking.CollocMinCount))
    // pmi non-increasing in rank order; ties broken by bigram asc
    r.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        val (pa, pb) = (a.getDouble(3), b.getDouble(3))
        assert(pa > pb || (pa == pb && a.getString(1) < b.getString(1)))
      case _ =>
    }
  }

  test("kneser-ney: every multi-token doc scored, ll negative, and the " +
       "smoothed probabilities sum to ~1 per context") {
    val r = Ranking.kneserNeyLogLikelihood(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(r.length === n)
    // scored docs have negative avg ll (probabilities < 1)
    assert(r.filter(_.getLong(1) > 0).forall(x => x.getDouble(2) < 0.0))
    // the KN kernel: for each context w1, sum over observed w2 of
    // p(w2|w1) <= 1 (discount mass plus the continuation share of
    // unobserved successors is what's missing) — spot-check via the
    // component tables on a trimmed corpus
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(50)
    import graft.functions.{TextFunctions => T}
    val bg = docs
      .select(explode(zip_with(
        slice(T.tokens(col("text")), lit(1),
          size(T.tokens(col("text"))) - 1),
        slice(T.tokens(col("text")), lit(2),
          size(T.tokens(col("text"))) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
    val cnt = bg.groupBy("bg").agg(count(lit(1)).as("cbg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val bt = cnt.count().toDouble
    val ctx = cnt.groupBy("w1")
      .agg(sum("cbg").as("cw1"), count(lit(1)).as("n1f"))
    val cont = cnt.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val sums = cnt.join(ctx, Seq("w1")).join(cont, Seq("w2"))
      .withColumn("p",
        (col("cbg") - Ranking.KnDiscount +
          lit(Ranking.KnDiscount) * col("n1f") * col("n1b") / bt) /
          col("cw1"))
      .groupBy("w1").agg(sum("p").as("psum"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach(x => assert(x.getDouble(1) <= 1.0 + 1e-9,
      s"context ${x.getString(0)} sums to ${x.getDouble(1)}"))
  }

  test("gap-fill: dense grid per series, locf only changes gap rows, " +
       "first grid row is an observation") {
    val r = TimeSeries.timeseriesFill(spark, dir)
    val rows = r.collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, g) =>
      val hours = g.map(_.getString(1)).sorted
      // grid density: consecutive hour strings, one row per hour
      assert(hours.distinct.length === hours.length)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
      val t0 = java.time.LocalDateTime.parse(hours.head, fmt)
      val t1 = java.time.LocalDateTime.parse(hours.last, fmt)
      assert(java.time.Duration.between(t0, t1).toHours + 1 === hours.length)
      val sorted = g.sortBy(_.getString(1))
      // span starts at an observation, so locf is total
      assert(!sorted.head.getBoolean(5))
      sorted.foreach { x =>
        val isGap = x.getBoolean(5)
        if (isGap) {
          assert(x.getLong(2) === 0L)
          assert(x.isNullAt(3))
          assert(!x.isNullAt(4)) // filled from the last observation
        } else {
          // on observed rows locf == the observation itself
          assert(x.getDouble(3) === x.getDouble(4))
        }
      }
    }
    // the fill actually fires at this SF (the series is hour-sparse)
    assert(rows.count(_.getBoolean(5)) > 0)
  }

  test("ols fit: slope on chars is positive, r2 in (0, 1], and the fit " +
       "explains most of the variance on the log-log pair") {
    val row = Curation.qualityRegression(spark, dir).collect().head
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(row.getLong(0) === n)
    val (b1, r2, rmse) =
      (row.getDouble(2), row.getDouble(4), row.getDouble(5))
    // more characters -> more tokens, overwhelmingly
    assert(b1 > 0.0)
    assert(r2 > 0.5 && r2 <= 1.0, s"r2 = $r2")
    assert(rmse >= 0.0)
  }

  test("ols fit: the guard rejects a singular design matrix") {
    // a constant feature makes X'X singular; the dir-independent way to
    // prove the guard is live is the raw formula on degenerate sums
    val s = spark
    import s.implicits._
    val e = intercept[Exception] {
      Seq((4.0, 2.0, 0.0, 1.5, 0.0, 0.0, 1.0, 0.6, 0.0, 0.9))
        .toDF("a11", "a12", "a13", "a22", "a23", "a33",
          "sy", "s1y", "s2y", "syy")
        .selectExpr("*", s"${Curation.RegDet} AS det0")
        .selectExpr("CASE WHEN abs(det0) < 1e-6 THEN " +
          "CAST(raise_error('singular') AS DOUBLE) ELSE det0 END AS det")
        .collect()
    }
    assert(e.getMessage.contains("singular"))
  }

  test("knn graph: exactly k neighbors per stride node, no self edges, " +
       "cosine non-increasing, and the custom operator carries the plan") {
    val df = Ann.knnGraph(spark, dir)
    // the GroupedTopK physical operator is what executes the reduction
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GroupedTopK"),
      s"expected GroupedTopKExec in:\n$physical")
    val rows = df.collect()
    val nq = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % Ann.KnnStride === 0).count()
    assert(rows.length === nq * Ann.KnnK)
    rows.groupBy(_.getLong(0)).foreach { case (src, g) =>
      assert(g.map(_.getLong(1)).sorted.toSeq === (1L to Ann.KnnK))
      assert(g.forall(_.getLong(2) != src))
      val byRank = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
