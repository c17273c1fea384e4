package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants — the scale posture, tested. A query that
  * passes its oracle but regresses to a full scan / global sort / shuffle
  * join of a tiny dim table would still fail this suite.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filter_where pushes the comparison into the parquet scan") {
    val p = plan("filter_where")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), " +
      "IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"), p.take(600))
  }

  test("scan/limit queries prune columns at the reader") {
    val p = plan("limit_topk")
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
        "l_extendedprice:double>"), p.take(600))
  }

  test("limit_topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("rangepartitioning"), p.take(400))
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("join_broadcast_dims")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") === 2, p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("bucket_join: bucket-aligned SMJ, only the final rollup shuffles") {
    val p = plan("bucket_join")
    // both scans are bucketed on the join key, so the sort-merge join
    // needs no exchange AND no per-partition sort (files are sortBy'd,
    // one per bucket); the only exchange left is the 5-row priority
    // rollup's. A second exchange here means the layout was ignored.
    assert(p.contains("SortMergeJoin"), p.take(1200))
    assert(p.sliding("Exchange".length).count(_ == "Exchange") === 1,
      p.take(1200))
    assert(!p.contains("ReusedExchange"), p.take(1200))
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(!p.substring(joinIdx).contains("Sort "), // scans arrive sorted
      p.substring(joinIdx).take(800))
  }

  test("knn_graph_bucketed: pinned shuffle-hash bucket join (no " +
       "corpus-sized broadcast, no sort of the 22x-amplified probe " +
       "side) feeding the GroupedTopK heap reduction") {
    val p = plan("knn_graph_bucketed")
    // the shuffle_hash hint must hold against toy-scale AQE: both
    // exploded sides are corpus-sized, so a broadcast here is the plan
    // that dies at 100 TB — and a merge join would SORT the probe
    // explode, the join's dominant cost at x100 (SCALING.md r14)
    assert(p.contains("ShuffledHashJoin"), p.take(1200))
    assert(!p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    // the custom heap operator is what bounds the post-join stream
    assert(p.contains("GroupedTopK"), p.take(1200))
  }

  test("bloom_join: word-table probes broadcast; fact side unshuffled pre-filter") {
    val p = plan("bloom_join")
    // the k=3 probe joins against the 4096-word filter table must all be
    // broadcast — a shuffle of the fact stream for a 32 KiB bitset would
    // defeat the entire device
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 3, p.take(1200))
  }

  test("zorder_layout is per-row: zero exchanges, inside codegen") {
    val p = plan("zorder_layout")
    assert(!p.contains("Exchange"), p.take(600))
    // "*(1)" is the whole-stage-codegen span marker in toString output
    assert(p.contains("*(1)"), p.take(600))
  }

  test("fuzzy_join: candidates come from the gram equi-join, never a cross product") {
    val p = plan("fuzzy_join")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("merge_upsert: key-shuffled merge join, no corpus broadcast") {
    val p = plan("merge_upsert")
    // both sides may be large at 100 TB: the full-outer merge must be a
    // shuffle join (SMJ or shuffled hash), not a broadcast
    assert(p.contains("FullOuter"), p.take(1200))
    assert(!p.contains("BroadcastHashJoin FullOuter"), p.take(1200))
  }

  test("sample_exact_k / heavy_hitters take local top-k, never global sort") {
    val p1 = plan("sample_exact_k")
    assert(p1.contains("TakeOrderedAndProject"), p1.take(400))
    assert(!p1.toLowerCase.contains("rangepartitioning"), p1.take(400))
    val p2 = plan("heavy_hitters")
    assert(p2.contains("TakeOrderedAndProject"), p2.take(600))
    // token counts combine map-side before the one shuffle
    assert(p2.sliding("HashAggregate".length)
      .count(_ == "HashAggregate") >= 2, p2.take(800))
  }

  test("q1_agg aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q1_agg")
    // two HashAggregate stages around one exchange = partial + final
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      p.take(800))
  }

  test("sort_orderby uses range partitioning (sample + shuffle + local sort)") {
    val p = plan("sort_orderby")
    assert(p.toLowerCase.contains("rangepartitioning"), p.take(600))
  }

  test("q5 joins the dims by broadcast and filters the region at the scan") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(r_name), " +
      "EqualTo(r_name,ASIA)"), p.take(2000))
  }

  test("q7: the twice-joined nation dim broadcasts BOTH times under " +
       "different roles; no cartesian from the symmetric pair filter") {
    val p = plan("q7_volume_shipping")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2, p.take(1600))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q9: part LIKE filter pushed to the scan, nation broadcast, " +
       "no cartesian product") {
    val p = plan("q9_profit")
    // the selective dimension predicate prunes at the part READER —
    // StringContains pushes into the parquet scan
    assert(p.contains("StringContains(p_name,red)"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("q18: large-order set applies as a SEMI join (dedup by " +
       "construction), top-k via TakeOrderedAndProject") {
    val p = plan("q18_large_orders")
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q21: EXISTS pair decorrelated — one per-order aggregate, nation " +
       "broadcast, no correlated re-scans") {
    val p = plan("q21_suppliers_waiting")
    // the decorrelated formulation shows as ONE distinct-aggregate over
    // (orderkey) joined back — not nested-loop correlated subqueries
    assert(p.contains("BroadcastHashJoin"), p.take(1600))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
    // supplier-side nation filter reaches the supplier/nation scans:
    // n_name pushes into the nation reader
    assert(p.contains("EqualTo(n_name,NATION_12)"), p.take(2400))
  }

  test("q13: the priority predicate stays IN the outer-join condition " +
       "(zero-order customers survive), distribution agg after") {
    val p = plan("q13_custdist")
    // outer join preserved — a WHERE would have turned it inner
    assert(p.contains("LeftOuter"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("q17: correlated AVG decorrelated into one per-part aggregate; " +
       "part predicate pushed to the part scan; qualifying parts " +
       "broadcast") {
    val p = plan("q17_small_qty_revenue")
    assert(p.contains("EqualTo(p_brand,Brand#4)"), p.take(2400))
    assert(p.contains("BroadcastHashJoin"), p.take(1600))
    // no correlated re-scan: the plan has no nested-loop join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q20: nested semi-join chain — part LIKE pushed to the scan, " +
       "fact semi-joined, supplier semi-joined, nation broadcast") {
    val p = plan("q20_concentrated_suppliers")
    assert(p.contains("StringStartsWith(p_name,red)"), p.take(2400))
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q4: EXISTS decorrelated to a LeftSemi join carrying the " +
       "cross-side lateness condition; order-window filter at the scan") {
    val p = plan("q4_priority_check")
    assert(p.contains("LeftSemi"), p.take(2000))
    // the correlated predicate (l_shipdate vs o_orderdate+60) rides ON
    // the semi join — no correlated re-scan, no nested loop
    assert(p.contains("date_add"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q6: pure scan-filter-agg — every predicate pushed, no join, " +
       "single scan") {
    val p = plan("q6_forecast_revenue")
    // metadata strings truncate at 100 chars, so pin the (full) Filter
    // operator line instead of PushedFilters
    assert("l_shipdate#\\d+ >= 1996-01-01".r.findFirstIn(p).isDefined,
      p.take(1600))
    assert("l_quantity#\\d+ < 24\\.0".r.findFirstIn(p).isDefined, p.take(1600))
    assert(p.contains("GreaterThanOrEqual(l_shipda"), p.take(1600))
    assert(!p.contains("Join"), p.take(1200))
    assert("FileScan".r.findAllIn(p).size === 1, p.take(1200))
  }

  test("q8: the deepest join tree — all seven joins broadcast (dims " +
       "and filtered fact feeders), no cartesian") {
    val p = plan("q8_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5, p.take(2400))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q10: returnflag pushed to the fact scan, top-20 via " +
       "TakeOrderedAndProject") {
    val p = plan("q10_returned_items")
    assert(p.contains("EqualTo(l_returnflag,R)"), p.take(2400))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q12: lateness rides the join condition; shipdate window pushed " +
       "to the fact scan") {
    val p = plan("q12_late_by_flag")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(2400))
    assert(p.contains("date_add"), p.take(2400))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q15: scalar MAX joins back as an equality hash join (ties " +
       "survive, no re-aggregation of the view on the probe side)") {
    val p = plan("q15_top_supplier")
    // Catalyst turns crossJoin(broadcast(max)) + equality filter into a
    // hash join keyed ON the equality — the one-row side broadcast
    assert(p.contains("max_revenue"), p.take(2400))
    assert(!p.contains("CartesianProduct"), p.take(1600))
  }

  test("q19: the disjunctive predicate factors onto BOTH scans — " +
       "quantity bands to lineitem, brand/size to part — with the full " +
       "OR at the join") {
    val p = plan("q19_disjunct_revenue")
    // lineitem scan receives the quantity-band disjunction (the scan's
    // PushedFilters truncates; its Filter line carries the full form)
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      p.take(3000))
    assert(("\\(l_quantity#\\d+ >= 1\\.0\\) AND " +
      "\\(l_quantity#\\d+ <= 11\\.0\\)").r.findFirstIn(p).isDefined,
      p.take(3000))
    // part scan receives the brand/size disjunction (plus the common
    // p_size >= 1 factor)
    assert("\\(p_size#\\d+ >= 1\\)".r.findFirstIn(p).isDefined, p.take(3000))
    assert(("\\(p_brand#\\d+ = Brand#12\\) AND " +
      "\\(p_size#\\d+ <= 5\\)").r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q22: NOT EXISTS as a LeftAnti probe with the lapse window " +
       "pushed; the scalar average is the broadcast one-row frame") {
    val p = plan("q22_sales_opportunity")
    assert(p.contains("LeftAnti"), p.take(2400))
    assert(p.contains("GreaterThanOrEqual(o_orderdate,1999-01-01"), p.take(2400))
    // the only nested-loop is the broadcast SCALAR frame (one row)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(2000))
  }

  test("q2: correlated region-MIN decorrelated — part predicates pushed " +
       "to the part scan, dims broadcast, fact aggregated once (no " +
       "correlated re-scan, no nested loop)") {
    val p = plan("q2_min_cost_supplier")
    assert(p.contains("EqualTo(p_type,SMALL)"), p.take(3000))
    assert(p.contains("EqualTo(r_name,EUROPE)"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("q11: the HAVING scalar is a broadcast one-row frame; the nation " +
       "predicate pushed to its scan; one fact aggregate") {
    val p = plan("q11_important_value")
    assert(p.contains("EqualTo(n_name,NATION_3)"), p.take(3000))
    // the only nested-loop is the broadcast SCALAR threshold (one row)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1600))
  }

  test("q16: NOT IN rides a LeftAnti build side; part predicates pushed; " +
       "distinct count is the two-phase aggregate") {
    val p = plan("q16_supplier_count")
    assert(p.contains("LeftAnti"), p.take(2400))
    assert(p.contains("LessThan(s_acctbal,1000.0)"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
  }

  test("dedup_substring: candidates ride the window-count device — the " +
       "explode+md5 subtree is SINGLE-consumer (no join at all), no " +
       "pair join, no nested loop") {
    val p = plan("dedup_substring")
    // the capBuckets lesson: count-over-window keeps one consumer; a
    // groupBy+join shape would recompute the token pass per consumer
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
    // two hash EXCHANGES (the wh window + the doc islands); the bound is
    // <= 3 occurrences because the formatted plan string names the wh
    // partitioning once more inside a window-spec header than as an
    // Exchange node — the invariant pinned is "no third exchange", i.e.
    // no groupBy+join shape sneaking a (doc_id)-keyed aggregate back in
    assert("hashpartitioning".r.findAllIn(p.toLowerCase).size <= 3,
      p.take(2400))
    // island assembly is doc-partitioned windowing; output unsorted —
    // no range exchange anywhere (a presentational global sort on a
    // corpus-scaled span set would be real cost at 100 TB)
    assert(!p.contains("rangepartitioning"), p.take(2000))
  }

  test("dedup_substring_keepone: the canonical election rides the SAME " +
       "wh exchange as the hits window — no extra shuffle, no join") {
    val p = plan("dedup_substring_keepone")
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("rangepartitioning"), p.take(2000))
  }

  test("project_expr stays in a single whole-stage codegen span, no shuffle") {
    val p = plan("project_expr")
    assert(!p.contains("Exchange"), p.take(600))
    // "*(1)" prefix = operator inside whole-stage-codegen stage 1
    assert(p.contains("*(1) Project"), p.take(600))
  }

  test("curation per-row ops are shuffle-free scans") {
    // pii_redact / quality_model / sample_stratified must stay pure
    // projections — a stray exchange would mean a 100 TB corpus pass
    // started shuffling
    Seq("pii_redact", "quality_model", "sample_stratified").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q: ${p.take(400)}")
    }
  }

  test("pack_sequences needs exactly one exchange (the lang window)") {
    val p = plan("pack_sequences")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") === 1,
      p.take(800))
  }

  test("decontaminate broadcasts the benchmark side, streams the corpus") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("dedup_ngram: no profile expression below the round-robin exchange") {
    // Regression pin: join-key IsNotNull inference once pushed the ENTIRE
    // interpreted n-gram profile (md5 transforms) below the repartition,
    // serializing it into the single-split scan stage. The non-nullable
    // key wrapping must keep everything under RoundRobinPartitioning
    // md5-free (plain column scans only).
    val p = plan("dedup_ngram")
    var rr = p.indexOf("RoundRobinPartitioning")
    assert(rr >= 0, p.take(400))
    while (rr >= 0) {
      val scan = p.indexOf("FileScan", rr)
      assert(scan > rr, p.substring(rr).take(400))
      val below = p.substring(rr, scan)
      assert(!below.contains("md5("), below.take(1200))
      rr = p.indexOf("RoundRobinPartitioning", rr + 1)
    }
  }

  test("dedup_containment: count-signature prefilter sits between " +
       "candidate generation and the verify joins") {
    // the candidate tier is materialized (localCheckpoint) before the
    // verify since r18, so its shape is pinned on the candidate
    // frame's OWN plan: the histogram aggregation (typed Aggregator)
    // builds the per-doc signature...
    val (_, cand) = graft.operators.Dedup.containmentCandidates(spark, dir)
    val cp = cand.queryExecution.executedPlan.toString
    assert(cp.toLowerCase.contains("slothistogram"), cp.take(2000))
    // ...and the slot-wise min-sum bound is evaluated as a filter on the
    // candidate pairs (zip_with/least fold over the two signature
    // vectors) — if this pin breaks, candidates are reaching the
    // doc-sized verify joins unscreened
    assert(cp.contains("zip_with") && cp.contains("least"), cp.take(2000))
    assert(cp.contains("aggregate(zip_with"), cp.take(2000))
    // the full query's verify tier reads the CHECKPOINTED candidates
    // and semi-joins the gram profile down to candidate docs before
    // the pinned-SMJ exact-intersection legs: candidate-bounded id
    // frames broadcast, corpus-scaled gram lists never do
    val p = plan("dedup_containment")
    assert(p.contains("LeftSemi, BuildRight") ||
      p.contains("LeftSemi BuildRight"), p.take(2000))
    assert(p.contains("SortMergeJoin"), p.take(2000))
  }

  test("dedup_minhash: corpus-sized self-join is SMJ, survivors broadcast") {
    val p = plan("dedup_minhash")
    // band self-join must not broadcast a corpus-derived side
    assert(p.contains("SortMergeJoin"), p.take(1500))
    // verify joins broadcast the pair list (streamed corpus side)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("dedup self-joins reuse ONE blocking-key shuffle (final plans)") {
    // The claim made throughout Dedup: the bucket-cap window plants the
    // blocking-key Exchange, and the merge-hinted self-join's two sides
    // both need exactly that partitioning — so AQE materializes the
    // (expensive) signature/profile pipeline once and the second side is
    // a ReusedExchange. Runtime reuse only exists in the FINAL adaptive
    // plan, so each df's own QueryExecution is executed first.
    Seq("dedup_minhash" -> "band", "dedup_simhash" -> "ci",
        "dedup_embedding_lsh" -> "bucket", "dedup_winnow" -> "fp",
        "dedup_ngram" -> "mg").foreach { case (q, key) =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"$q: ${p.take(300)}")
      assert(p.linesIterator.exists(l =>
        l.contains("ReusedExchange") && l.contains(key)),
        s"$q: ${p.take(4000)}")
    }
  }

  test("ngram ladder: one top-order explode; count tables join, not broadcast") {
    // the order-n tf frame must be the single consumer of the top-order
    // explode (window-sum ctg, no second tokenize of the corpus for it);
    // lower-order count tables are vocab-sized shuffle joins — at web
    // scale the vocab does NOT fit a broadcast. The top-order gram
    // generator is identifiable by its sequence bound (nt - (n-1)):
    // count tables stop one order below.
    for ((q, n) <- Seq("trigram_ll" -> 3, "fivegram_ll" -> 5)) {
      val p = plan(q)
      // the top-order generator is the codegen'd word_ngrams(toks, n)
      // (attribute ids vary); the rung counts use gram_rungs, so a
      // second word_ngrams occurrence would mean the corpus pass forked
      val topScans = s"word_ngrams\\(toks#\\d+, $n\\)".r.findAllIn(p).length
      assert(topScans === 1, s"$q: ${p.take(2000)}")
    }
  }

  test("ann_ivf: probe assignment is in the plan, not driver-side") {
    // probe cells come from the native vec_cell_topn expression (the
    // centroid matrix is a reference object, not a literal tree); no
    // LocalTableScan of collected probe rows, and no window exchange
    // for probe selection either
    val p = plan("ann_ivf")
    assert(!p.contains("LocalTableScan"), p.take(1500))
    assert(p.contains("vec_cell_topn"), p.take(1500))
  }

  test("join_range is an equi-join on buckets, never a nested loop") {
    val p = plan("join_range")
    assert(!p.contains("NestedLoop"), p.take(1200))
    assert(!p.contains("Cartesian"), p.take(1200))
    assert(p.contains("Join"), p.take(1200))
  }

  test("subq_correlated decorrelates to an aggregate + join") {
    // Catalyst must rewrite the per-row subquery — a surviving
    // InSubquery/scalar-subquery node would be a nested-loop at scale
    val p = plan("subq_correlated")
    assert(!p.toLowerCase.contains("subquery"), p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
    assert(p.contains("Join"), p.take(1200))
  }

  test("quantize_embeddings is per-row: zero exchanges, codegen'd") {
    val p = plan("quantize_embeddings")
    assert(!p.contains("Exchange"), p.take(1200))
    // whole-stage codegen shows as "*(n) " stage markers in toString
    assert(p.contains("*(1)"), p.take(1200))
  }

  test("tfidf: corpus tokenizes once; n_docs is a metadata-only count") {
    val p = plan("tfidf_topterms")
    // exactly one text-reading scan — the tf frame; df comes from a
    // window over it, NOT a second tokenize+join
    val textScans = p.linesIterator
      .count(l => l.contains("FileScan") && l.contains("text"))
    assert(textScans === 1, p.take(2000))
    // the document count reads no columns at all
    assert(p.contains("ReadSchema: struct<>"), p.take(2000))
  }

  test("bm25: query-term filter gates the exploded tokens pre-aggregate") {
    val p = plan("bm25_search")
    val filterAt = p.indexOf(" IN (data,model,system)")
    assert(filterAt >= 0, p.take(2000))
    // between the IN filter and the scan below it there is only the
    // token explode — no aggregate: the filter runs on raw exploded
    // tokens, so the shuffled tf volume is per-query-term. (A pure
    // index comparison against "HashAggregate" is ambiguous — other
    // branches, e.g. the dl/avgdl stats aggregate, print below.)
    val scanAt = p.indexOf("FileScan", filterAt)
    val below = p.substring(filterAt, if (scanAt > 0) scanAt else p.length)
    assert(below.contains("Generate"), below.take(1500))
    assert(!below.contains("HashAggregate"), below.take(1500))
  }

  test("hybrid fusion: both retrievers funnel through distributed top-k; " +
       "dense query broadcasts") {
    val p = plan("hybrid_rank_fusion")
    // each retriever list is cut with TakeOrderedAndProject BEFORE the
    // single-partition rank window ever sees a row
    assert(p.sliding("TakeOrderedAndProject".length)
      .count(_ == "TakeOrderedAndProject") >= 2, p.take(1500))
    // the 1-row query embedding is a broadcast NL join against the
    // corpus stream, and the corpus is never cross-joined to itself
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("scd2: one exchange feeds both window sorts") {
    val p = plan("scd2_history")
    // lag-filter and lead/row_number share the custkey partitioning: a
    // second hashpartitioning exchange would mean the window ordering
    // was re-shuffled rather than reused
    assert(p.sliding("hashpartitioning".length)
      .count(_ == "hashpartitioning") === 1, p.take(1500))
  }

  test("dsir: corpus tokenizes once (checkpoint barrier), models broadcast") {
    val p = plan("dsir_weights")
    // the (doc, bucket) frame is checkpoint-materialized: the score path
    // consumes it (Scan ExistingRDD) instead of re-running the explode
    assert(!p.contains("Generate"), p.take(1500))
    assert(p.contains("Scan ExistingRDD"), p.take(1500))
    // both domain models come back as broadcasts, never a corpus shuffle
    assert(p.contains("BroadcastExchange"), p.take(1500))
  }

  test("inverted index: one tokenize; window and collect share the term " +
       "exchange") {
    val p = plan("inverted_index")
    assert(p.sliding("Generate".length).count(_ == "Generate") === 1,
      p.take(1500))
    // df-band filter runs between the window and the collect_list with
    // no re-shuffle: exactly one term-keyed exchange in the plan
    assert(p.sliding("hashpartitioning(term".length)
      .count(_ == "hashpartitioning(term") === 1, p.take(1500))
  }

  test("pagerank: edges computed once (localCheckpoint), ranks never " +
       "broadcast") {
    val p = plan("pagerank_links")
    // the md5 edge-gen pass is cut from the plan by the checkpoint: no
    // conv/md5 expression may appear in the iteration lineage
    assert(!p.contains("md5("), p.take(2000))
    // iteration joins are shuffle hash/SMJ on the growing rank frame —
    // broadcasting a corpus-sized rank table would die at scale. (The
    // tiny n_docs scalar IS broadcast; rank_fp frames must not be.)
    assert(!p.contains("BroadcastHashJoin [doc_id"), p.take(2000))
  }

  test("profile_table: ONE Expand pass, HASH-aggregated (no string " +
       "min/max demoting it to SortAggregate), plus exactly one " +
       "column-pruned string-fold scan") {
    val p = plan("profile_table")
    assert(p.sliding("Expand".length).count(_ == "Expand") === 1,
      p.take(1500))
    // r21: string min/max live in a separate grouping-free fold (its
    // scan reads ONLY the string column) so the Expand aggregate stays
    // HashAggregate — a string aggregation buffer would demote the
    // whole Expand pass, sort included, to SortAggregate (the measured
    // 4.4 s stage). Two scans total, the second column-pruned.
    assert(p.sliding("FileScan".length).count(_ == "FileScan") === 2,
      p.take(1500))
    assert(p.contains("ReadSchema: struct<o_orderpriority:string>"),
      p.take(2000))
    // the Expand's aggregates are hash-based; the only SortAggregate
    // allowed is the grouping-free string fold (needs no sort)
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(p.sliding("SortAggregate".length)
      .count(_ == "SortAggregate") <= 2, p.take(2000))
  }

  test("domain_cap: executed by GroupedTopK heaps, not a full window " +
       "sort; the rank window sees only survivors") {
    val p = plan("domain_cap")
    assert(p.contains("GroupedTopK"), p.take(1500))
    // exactly one Window (the <=K-row rank numbering AFTER the top-k);
    // the corpus itself is never window-sorted
    assert(p.sliding("Window".length).count(_ == "Window") === 1,
      p.take(1500))
  }

  test("weighted_sample: the race is a TakeOrdered funnel, never a " +
       "global sort") {
    val p = plan("weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("rangepartitioning"), p.take(1200))
  }

  test("winsorize/fuzzy-decontam: bounds and benchmark tables broadcast " +
       "back; the corpus stream is never the broadcast side") {
    val pw = plan("winsorize_scores")
    assert(pw.contains("BroadcastHashJoin"), pw.take(1500))
    val pf = plan("decontaminate_fuzzy")
    // both the bench-shingle and the nb joins are broadcasts
    assert(pf.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2, pf.take(2000))
  }

  test("sketch_freq: the sketch side is a two-stage partial/final " +
       "aggregate — map-side MG buffers, no token-keyed shuffle") {
    val p = plan("sketch_freq")
    // the MG aggregator appears in partial and final mode (objHashAgg);
    // the exact side's token groupBy is the only token-keyed exchange
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.sliding("hashpartitioning(token".length)
      .count(_ == "hashpartitioning(token") === 1, p.take(2000))
  }

  test("shuffle_shards: one shard-hash exchange, no global sort, no " +
       "single-partition window") {
    // The export shuffle's scale contract: shard assignment is per-row,
    // the position window partitions BY shard — the only data-sized
    // movement is one hash exchange on shard. A global ORDER
    // BY/row_number formulation would show rangepartitioning or a
    // SinglePartition exchange here and melt at corpus scale.
    val p = plan("shuffle_shards")
    assert(p.contains("hashpartitioning(shard"), p.take(1500))
    assert(!p.contains("rangepartitioning"), p.take(1500))
    assert(!p.contains("SinglePartition"), p.take(1500))
  }

  test("ann_autotune sweeps all ladder rungs from one candidate frame " +
       "(no per-rung re-scan of the corpus)") {
    // The rewrite this pins: ladder explode + pr <= nprobe filter over
    // ONE candidate frame. The union-of-filters formulation it replaced
    // re-executed the assignment scan and probe-join once per rung.
    // Static scan accounting for the kept shape: assignment (1) + probe
    // build (1) + the brute-force baseline's two sides x two uses
    // (top-k join side and the n_exact count — AQE reuses them at
    // runtime as ReusedExchange, but the static plan prints both) = 6.
    // The per-rung formulation prints 4 rungs x 2 + 4 = 12 — the pin
    // sits between the two shapes.
    val p = plan("ann_autotune")
    val scans = p.sliding("Scan parquet".length)
      .count(_ == "Scan parquet")
    assert(scans <= 6, s"$scans embeddings scans — per-rung re-execution?")
    assert(p.contains("hashpartitioning(nprobe"), p.take(2000))
  }

  test("cte_recursive plans a native UnionLoop with map-side partial max") {
    val p = plan("cte_recursive")
    // the recursion is Spark's own loop operator — anchor + a filtered
    // step over UnionLoopRef — not a hand-unrolled union chain
    assert(p.contains("UnionLoop"), p.take(800))
    assert(p.contains("UnionLoopRef"), p.take(800))
    // the depth aggregation combines before its one shuffle
    assert(p.contains("partial_max"), p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      p.take(800))
  }

  test("registry invariant: every query's output columns are " +
       "harness-atomic types (no decimal, nested, or binary)") {
    // The driver's oracle harness reads the compare's two sides through
    // different libraries and hashes value reprs. Three type classes
    // break that even when values are identical: DECIMAL (pyarrow
    // Decimal objects vs duckdb float64 — the mechanism behind
    // histogram_equidepth's four red rounds), nested ARRAY/MAP/STRUCT
    // (unsortable/unhashable rows — why every array output is
    // canonicalized to a joined string), and BINARY (bytes-vs-blob
    // reprs). Every pipeline may use them INTERNALLY; the final schema
    // must land on the atomic allowlist below — the exact set the full
    // full registry dump exhibits today, pinned permanently.
    import org.apache.spark.sql.types._
    val allowed: Set[DataType] = Set(BooleanType, ByteType, ShortType,
      IntegerType, LongType, FloatType, DoubleType, StringType,
      DateType, TimestampType, TimestampNTZType)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, dir).schema.fields.collect {
          case f if !allowed.contains(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
