package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: recall@K of the ANN paths vs the exact baseline
  * across parameter settings — the measurement behind the thresholds in
  * graft.operators.Ann (LshRecallMin / IvfRecallMin) and the PipelineSpec
  * bounds. Usage: runMain graft.RecallProbe [sfDir]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.engine.GraftSession.getOrCreate("graft-recall-probe")
    val bf = graft.operators.Ann.annBruteforce(spark, sfDir)
      .select(col("q_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("q_id"), col("cand_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & got).size.toDouble / bf.size
    }
    for (tables <- Seq(1, 2, 3, 4); pb <- Seq(1, 2))
      println(f"lsh nBits=6 nTables=$tables probeBits=$pb recall=${
        recallOf(graft.operators.Ann.annLsh(spark, sfDir, 6, tables, pb))}%.3f")
    for (nc <- Seq(16, 32); probe <- Seq(2, 4, 6, 8))
      println(f"ivf nCentroids=$nc nProbe=$probe recall=${
        recallOf(graft.operators.Ann.annIvf(spark, sfDir, nc, probe))}%.3f")
    spark.stop()
  }
}
