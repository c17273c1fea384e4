package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.table

/** Link-graph analytics over the document corpus — the crawl-curation
  * side of an LLM data pipeline (harmonic/PageRank centrality is the
  * standard crawl-frontier and quality prior: see Common Crawl's use of
  * harmonic centrality, and Fetterly/Najork on spam vs. rank).
  *
  * The corpus has no explicit hyperlinks, so the graph is DERIVED
  * deterministically: every document emits [[PrOutDeg]] out-links whose
  * targets are md5-hash-mod-N of (doc_id, slot) — a reproducible
  * scale-free-ish multigraph both engines can reconstruct independently,
  * which is exactly what makes the operator oracle-checkable end to end.
  *
  * All rank arithmetic is FIXED-POINT BIGINT (ranks scaled by
  * [[PrScale]]): each iteration is
  *   rank'(v) = 0.15*S  +  (85 * sum over in-edges of rank(u) div 3) div 100
  * in pure integer ops, so Spark and DuckDB produce bit-identical
  * integers — no float accumulation-order drift across engines, shuffle
  * orders, or cluster sizes. (Classic float PageRank is NOT
  * cross-engine hashable: the in-neighbor sum order differs.) The
  * truncation loses < 1 scale-unit per edge per iteration — at
  * [[PrScale]] = 1e9 that is < 1e-7 relative, far below ranking
  * resolution. Headroom: 85 * N * [[PrScale]] must stay under 2^63, so
  * the demo covers corpora to ~1e8 docs; beyond that drop PrScale a
  * decade per 10x docs.
  *
  * Scale shape: edges are one narrow codegen'd pass over the corpus
  * (localCheckpoint'd — [[PrIters]] consumers would otherwise recompute
  * the md5 edge-gen per iteration); each iteration is one shuffle join
  * of ranks against edges on src plus one hash aggregate on dst — the
  * textbook distributed PageRank step, with per-dst partial sums
  * map-side combined. Nothing corpus-sized broadcasts; the driver never
  * sees a rank. Iterations are a fixed unrolled count (power iteration
  * to tolerance is the same loop with a convergence action per round,
  * as dedupClusters does).
  */
object Graph {

  /** Fixed-point scale: 1 rank unit = 1e-9. */
  val PrScale = 1000000000L

  /** Damping 0.85 as the integer pair (85, 100); base = 0.15 * scale. */
  val PrBase: Long = 15L * PrScale / 100L

  val PrIters = 5
  val PrOutDeg = 3
  val PrTopK = 100

  /** The derived link multigraph: [[PrOutDeg]] md5-mod-N out-edges per
    * document — one narrow codegen'd pass over the corpus. Callers that
    * consume it repeatedly (the power iteration) should localCheckpoint
    * the result.
    */
  private def linkEdges(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents").select(col("doc_id"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    // slot column: PrOutDeg deterministic out-links per doc
    val slots = array((1 to PrOutDeg).map(lit): _*)
    docs.crossJoin(n)
      .select(col("doc_id").as("src"), explode(slots).as("j"),
        col("n_docs"))
      .select(col("src"),
        (conv(substring(md5(concat(col("src").cast("string"), lit(":"),
          col("j").cast("string"))), 1, 15), 16, 10).cast("long")
          % col("n_docs")).as("dst"))
  }

  /** The edge CTE both oracle mirrors share, built from the same
    * constants as [[linkEdges]].
    */
  private def linkEdgesSqlCte: String =
    s"""n AS (SELECT count(*) AS n_docs FROM documents),
      e AS (
        SELECT doc_id AS src,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
            CAST(t.j AS VARCHAR)), 1, 15) AS BIGINT) % n_docs AS dst
        FROM documents, n,
          unnest(${(1 to PrOutDeg).mkString("[", ", ", "]")}) AS t(j))"""

  /** Derived-link PageRank, top-[[PrTopK]] docs by final fixed-point rank
    * (oracle-checked — the DuckDB mirror unrolls the same [[PrIters]]
    * iterations as chained CTEs over the identical md5-derived edges).
    */
  def pagerankLinks(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents").select(col("doc_id"))
    val edges = linkEdges(s, dir)
      .localCheckpoint() // PrIters consumers of the md5 edge-gen pass
    val init = docs.select(col("doc_id"), lit(PrScale).as("rank_fp"))
    // string-keyed using-joins throughout: every frame in the loop shares
    // the one documents scan in its lineage, and USING-join column
    // coalescing stays unambiguous under Spark's self-join deduplication
    val fin = (1 to PrIters).foldLeft(init) { (r, _) =>
      val contrib = edges
        .join(r.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"),
          expr(s"rank_fp div $PrOutDeg").as("c"))
        .groupBy(col("doc_id")).agg(sum(col("c")).as("in_fp"))
      docs.join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(PrBase) +
            expr("(85 * coalesce(in_fp, CAST(0 AS BIGINT))) div 100"))
            .as("rank_fp"))
    }
    val w = Window.orderBy(col("rank_fp").desc, col("doc_id").asc)
    fin.orderBy(col("rank_fp").desc, col("doc_id").asc).limit(PrTopK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("rank_fp"))
  }

  /** Generated oracle SQL — unrolled power iteration with the same
    * constants, edge derivation, and integer op order as the Spark plan.
    * DuckDB notes: `sum(BIGINT)` widens to HUGEINT (cast back before the
    * 85x product), and `//` is integer division (both operands positive
    * here, so it agrees with Spark's `div`).
    */
  def pagerankOracleSql: String = {
    val iters = (1 to PrIters).map { i =>
      s"""r$i AS (
        SELECT d.doc_id,
          $PrBase + (85 * coalesce(c.in_fp, 0)) // 100 AS rank_fp
        FROM documents d LEFT JOIN (
          SELECT dst, CAST(sum(rank_fp // $PrOutDeg) AS BIGINT) AS in_fp
          FROM e JOIN r${i - 1} ON src = doc_id GROUP BY dst) c
        ON d.doc_id = c.dst)"""
    }.mkString(",\n      ")
    s"""
      WITH $linkEdgesSqlCte,
      r0 AS (SELECT doc_id, CAST($PrScale AS BIGINT) AS rank_fp
             FROM documents),
      $iters,
      ranked AS (
        SELECT doc_id, rank_fp,
          row_number() OVER (ORDER BY rank_fp DESC, doc_id) AS rank
        FROM r$PrIters)
      SELECT rank, doc_id, rank_fp FROM ranked WHERE rank <= $PrTopK"""
  }

  /** In-degree distribution of the link graph (oracle-checked): how many
    * nodes receive k in-links, including the zero-in-degree bucket — the
    * first diagnostic run on any crawl graph (a missing low tail or a
    * monster hub both mean the link extractor is broken). Pure integer
    * counts; one shuffle to per-dst counts, one to the histogram, both
    * on keys far smaller than the corpus.
    */
  def graphDegrees(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents").select(col("doc_id"))
    val indeg = linkEdges(s, dir)
      .groupBy(col("dst")).agg(count(lit(1)).as("in_deg"))
      .withColumnRenamed("dst", "doc_id")
    docs.join(indeg, Seq("doc_id"), "left")
      .select(coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .groupBy(col("in_deg")).agg(count(lit(1)).as("n_nodes"))
  }

  def graphDegreesOracleSql: String =
    s"""
      WITH $linkEdgesSqlCte,
      indeg AS (
        SELECT dst AS doc_id, CAST(count(*) AS BIGINT) AS in_deg
        FROM e GROUP BY dst),
      nodes AS (
        SELECT coalesce(i.in_deg, 0) AS in_deg
        FROM documents d LEFT JOIN indeg i ON d.doc_id = i.doc_id)
      SELECT in_deg, count(*) AS n_nodes FROM nodes GROUP BY in_deg"""

  /** Synchronous min-label rounds for [[labelPropagation]]. */
  val LpIters = 3

  /** Bounded min-label propagation over the directed link graph
    * (oracle-checked): every node starts labeled with its own doc_id and
    * each round adopts the minimum label among itself and its in-
    * neighbors — after k rounds, label(v) = min doc_id that reaches v
    * within k hops. The bounded-round semantics IS the contract (the
    * standard community-seeding / reachability-coloring primitive);
    * running to convergence is the same loop with a fixed-point action
    * per round, which [[graft.operators.Dedup.dedupClusters]] already
    * demonstrates with pointer jumping for the undirected case.
    *
    * Integer labels only — no float drift; each round is one shuffle
    * join of labels against edges plus a min-aggregate on dst, the same
    * scale shape as a PageRank step.
    */
  def labelPropagation(s: SparkSession, dir: String,
                       iters: Int = LpIters): DataFrame = {
    val docs = table(s, dir, "documents").select(col("doc_id"))
    val edges = linkEdges(s, dir).localCheckpoint() // iters consumers
    val init = docs.select(col("doc_id"), col("doc_id").as("label"))
    (1 to iters).foldLeft(init) { (l, _) =>
      val inMin = edges
        .join(l.select(col("doc_id").as("src"), col("label").as("slabel")),
          Seq("src"))
        .groupBy(col("dst")).agg(min(col("slabel")).as("in_min"))
        .withColumnRenamed("dst", "doc_id")
      l.join(inMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("in_min"), col("label")))
            .as("label"))
    }
  }

  def labelPropagationOracleSql: String = {
    val iters = (1 to LpIters).map { i =>
      s"""l$i AS (
        SELECT l.doc_id,
          least(l.label, coalesce(m.in_min, l.label)) AS label
        FROM l${i - 1} l LEFT JOIN (
          SELECT dst, min(label) AS in_min
          FROM e JOIN l${i - 1} ON src = doc_id GROUP BY dst) m
        ON l.doc_id = m.dst)"""
    }.mkString(",\n      ")
    s"""
      WITH $linkEdgesSqlCte,
      l0 AS (SELECT doc_id, doc_id AS label FROM documents),
      $iters
      SELECT doc_id, label FROM l$LpIters"""
  }

  /** Triangle count + global clustering coefficient of the link graph
    * (oracle-checked) — the standard graph-health diagnostic (a crawl
    * graph with near-zero clustering is a spam farm or a broken
    * extractor; Watts–Strogatz C is the number everyone quotes).
    *
    * Algorithm: degree-ordered edge orientation (the classic
    * O(m^{3/2}) bound — Chiba–Nishizeki / Schank–Wagner). Each
    * undirected simple edge is oriented from its (degree, id)-smaller
    * endpoint to the larger, so out-degrees are bounded by O(sqrt(m))
    * even on power-law hubs; wedges are enumerated only at each
    * triangle's smallest vertex and each triangle is counted EXACTLY
    * once — no /3 or /6 correction, no duplicate pairs.
    *
    * Scale shape: one distinct-shuffle to simple edges (checkpointed —
    * three consumers), one count-aggregate for degrees (node-sized),
    * then two shuffle joins on edge keys: the wedge self-join on the
    * orientation source and the closing-edge probe on (b, c). The
    * orientation is what keeps the wedge join from exploding on hubs —
    * a 10M-follower node contributes no wedges at its own apex unless
    * its neighbors out-rank it. All-integer arithmetic except the final
    * scalar clustering coefficient.
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents").select(col("doc_id"))
    val simple = linkEdges(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint() // 3 consumers: degrees, orientation, edge count
    val deg = simple.select(col("u").as("x"))
      .union(simple.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
      .localCheckpoint() // 2 consumers: orientation join, wedge total
    val fwd = col("udeg") < col("vdeg") ||
      (col("udeg") === col("vdeg") && col("u") < col("v"))
    val oriented = simple
      .join(deg.select(col("x").as("u"), col("deg").as("udeg")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("deg").as("vdeg")), Seq("v"))
      .select(when(fwd, col("u")).otherwise(col("v")).as("a"),
        when(fwd, col("v")).otherwise(col("u")).as("b"),
        when(fwd, col("vdeg")).otherwise(col("udeg")).as("bdeg"))
      .localCheckpoint() // 3 consumers: two wedge legs + closing probe
    val wedges = oriented.select(col("a"), col("b"), col("bdeg"))
      .join(oriented.select(col("a"), col("b").as("c"),
        col("bdeg").as("cdeg")), Seq("a"))
      .filter(col("bdeg") < col("cdeg") ||
        (col("bdeg") === col("cdeg") && col("b") < col("c")))
    val nTri = wedges
      .join(oriented.select(col("a").as("b"), col("b").as("c")),
        Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = docs.agg(count(lit(1)).as("n_nodes"))
    val nEdges = simple.agg(count(lit(1)).as("n_edges"))
    // wedge total for C = 3T / W: sum over nodes of deg-choose-2
    val wTot = deg.agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    nNodes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(nTri))
      .crossJoin(broadcast(wTot))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        round(lit(3.0) * col("n_triangles").cast("double") /
          col("n_wedges").cast("double"), 6).as("global_cc"))
  }

  /** DuckDB mirror of [[graphTriangles]] — identical edge derivation,
    * orientation predicate, and wedge/closing joins; `//` is DuckDB
    * integer division (operands non-negative, agrees with Spark `div`).
    */
  def graphTrianglesOracleSql: String =
    s"""
      WITH $linkEdgesSqlCte,
      simple AS (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM e WHERE src <> dst),
      deg AS (
        SELECT x, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT u AS x FROM simple
              UNION ALL SELECT v AS x FROM simple)
        GROUP BY x),
      o AS (
        SELECT
          CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
               THEN u ELSE v END AS a,
          CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
               THEN v ELSE u END AS b,
          CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
               THEN dv.deg ELSE du.deg END AS bdeg
        FROM simple JOIN deg du ON du.x = u JOIN deg dv ON dv.x = v),
      wed AS (
        SELECT e1.b, e2.b AS c
        FROM o e1 JOIN o e2 ON e1.a = e2.a
        WHERE e1.bdeg < e2.bdeg OR (e1.bdeg = e2.bdeg AND e1.b < e2.b)),
      tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM wed JOIN o ON o.a = wed.b AND o.b = wed.c),
      stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_nodes,
          (SELECT CAST(count(*) AS BIGINT) FROM simple) AS n_edges,
          (SELECT n_triangles FROM tri) AS n_triangles,
          (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT)
           FROM deg) AS n_wedges)
      SELECT n_nodes, n_edges, n_triangles, n_wedges,
        round(3.0 * CAST(n_triangles AS DOUBLE) /
              CAST(n_wedges AS DOUBLE), 6) AS global_cc
      FROM stats"""
}
