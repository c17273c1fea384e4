package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: recall@K of the ANN paths vs the exact baseline
  * across parameter settings — the measurement behind the thresholds in
  * graft.operators.Ann (LshRecallMin / IvfRecallMin) and the PipelineSpec
  * bounds. Usage: runMain graft.RecallProbe [sfDir] [sections]
  * where sections is a comma list of lsh,ivf,pq,knn (default: lsh,ivf).
  * The pq/knn sections quantify the corpus-growth recall knobs
  * (SCALING.md): PQ shortlist depth, and the bucketed graph's nTables
  * under the size-adaptive code width.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sections = args.lift(1).getOrElse("lsh,ivf").split(",").toSet
    val spark = graft.engine.GraftSession.getOrCreate("graft-recall-probe")
    // harness surface for the Ann ladder-cap session conf (the knob
    // that makes the knn recall floor purchasable past the default
    // index-size budget — see Ann.ladderFor)
    sys.env.get("SPARK_GRAFT_LADDER_CAP").foreach(c =>
      spark.conf.set("spark.graft.ann.ladderCap", c))
    // the r19 self-extension budget: with it set, the tuner closes a
    // measured floor shortfall itself (Ann.AutoBudgetConf)
    sys.env.get("SPARK_GRAFT_AUTO_BUDGET").foreach(c =>
      spark.conf.set(graft.operators.Ann.AutoBudgetConf, c))
    import graft.operators.Ann
    val bf = Ann.annBruteforce(spark, sfDir)
      .select(col("q_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("q_id"), col("cand_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & got).size.toDouble / bf.size
    }
    if (sections("lsh"))
      for (tables <- Seq(1, 2, 3, 4); pb <- Seq(1, 2))
        println(f"lsh nBits=6 nTables=$tables probeBits=$pb recall=${
          recallOf(Ann.annLsh(spark, sfDir, 6, tables, pb))}%.3f")
    if (sections("ivf"))
      for (nc <- Seq(16, 32); probe <- Seq(2, 4, 6, 8))
        println(f"ivf nCentroids=$nc nProbe=$probe recall=${
          recallOf(Ann.annIvf(spark, sfDir, nc, probe))}%.3f")
    if (sections("pq"))
      for (sl <- Seq(100, 200, 400, 800))
        println(f"pq shortlist=$sl recall=${
          recallOf(Ann.annPq(spark, sfDir, sl))}%.3f")
    if (sections("knn")) {
      // bucketed-graph recall vs the exact stride-subset graph, under
      // the size-adaptive code width, sweeping the buy-back knob
      val stride = Ann.strideFor(Ann.corpusCount(spark, sfDir))
      val exact = Ann.knnGraph(spark, sfDir)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (tables <- Seq(3, 6, 9)) {
        // srcStride: per-source independence makes the audit slice
        // exact, and only it is disk-feasible at ×100 (Ann scaladoc)
        val got = Ann.knnGraphBucketed(spark, sfDir, nTablesOpt = tables,
            srcStride = stride)
          .select(col("src"), col("dst")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"knn bits=${Ann.bitsFor(Ann.corpusCount(spark, sfDir))} " +
          f"nTables=$tables recall=${
            (exact & got).size.toDouble / exact.size}%.3f")
      }
    }
    if (sections("knn_cap")) {
      // raw (un-refined, explicitly-pinned table count) recall at and
      // beyond the default ladder cap — the measured recall-vs-budget
      // curve behind the spark.graft.ann.ladderCap knob
      val stride = Ann.strideFor(Ann.corpusCount(spark, sfDir))
      val exact = Ann.knnGraph(spark, sfDir)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (tables <- Seq(24, 48)) {
        val got = Ann.knnGraphBucketed(spark, sfDir, nTablesOpt = tables,
            srcStride = stride)
          .select(col("src"), col("dst")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"knn_cap nTables=$tables recall=${
          (exact & got).size.toDouble / exact.size}%.3f")
      }
    }
    if (sections("default_knn")) {
      // the knn leg of the default audit alone — it is by far the
      // heaviest (an exact strided graph over the corpus) and a crash
      // in it must not cost a rerun of the other three legs
      val n = Ann.corpusCount(spark, sfDir)
      val stride = Ann.strideFor(n)
      val exact = Ann.knnGraph(spark, sfDir)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Ann.knnGraphBucketed(spark, sfDir, srcStride = stride)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val r = (exact & got).size.toDouble / exact.size
      println(f"default knn recall=$r%.3f floor=${Ann.KnnGraphRecallMin} " +
        f"ok=${r >= Ann.KnnGraphRecallMin}")
      println(s"  (knn bits=${Ann.bitsFor(n)} " +
        s"tables=${Ann.cachedTables(sfDir).getOrElse(Ann.LshTables)})")
    }
    if (sections("default")) {
      // the floors-under-DEFAULT-invocation audit: every approximate
      // path exactly as the registry runs it, judged against its
      // calibrated floor — the size-adaptive recall knobs
      // (Ann.shortlistFor, Ann.tablesFor) must hold these at ANY corpus
      val n = Ann.corpusCount(spark, sfDir)
      def verdict(name: String, r: Double, floor: Double): Unit =
        println(f"default $name recall=$r%.3f floor=$floor ok=${r >= floor}")
      verdict("lsh", recallOf(Ann.annLsh(spark, sfDir)), Ann.LshRecallMin)
      verdict("ivf", recallOf(Ann.annIvf(spark, sfDir)), Ann.IvfRecallMin)
      verdict("pq", recallOf(Ann.annPq(spark, sfDir)), Ann.PqRecallMin)
      println(s"  (pq shortlist=${Ann.shortlistFor(n)})")
      val stride = Ann.strideFor(n)
      val exact = Ann.knnGraph(spark, sfDir)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Ann.knnGraphBucketed(spark, sfDir, srcStride = stride)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      verdict("knn", (exact & got).size.toDouble / exact.size,
        Ann.KnnGraphRecallMin)
      println(s"  (knn bits=${Ann.bitsFor(n)} " +
        s"tables=${Ann.cachedTables(sfDir).getOrElse(Ann.LshTables)})")
    }
    spark.stop()
  }
}
