package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-quality gates: constraint validation must DETECT planted
  * violations (not just wave green data through) in one scan, and the
  * PSI drift score must read near-zero for a split that is independent
  * of the binned variable.
  */
class ValidateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("validate_constraints: one scan, six rules, planted violations " +
       "detected") {
    val df = graft.operators.Validate.validateConstraints(spark, dir)
    val rows = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rows.size === 6)
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(rows.values.forall(_._1 == n)) // every rule checked all rows
    // clean rules pass with zero violations
    for (r <- Seq("not_null(l_shipdate)", "range(l_quantity,1.0,50.0)",
      "non_negative(l_extendedprice)", "domain(l_returnflag,A|N|R)")) {
      assert(rows(r)._2 === 0L, r)
      assert(rows(r)._3, r)
    }
    // the two planted violations are DETECTED: l_tax exceeds the 0.05
    // cap on real rows, and the line key is genuinely non-unique here
    assert(rows("range(l_tax,0.0,0.05)")._2 > 0L)
    assert(!rows("range(l_tax,0.0,0.05)")._3)
    assert(rows("unique(l_orderkey,l_linenumber)")._2 > 0L)
    assert(!rows("unique(l_orderkey,l_linenumber)")._3)
    // all row-level rules ride ONE scan of the table (the distinct agg
    // is the only extra exchange; adding a rule must not add a pass) —
    // counted in the AQE final-plan string, since QueryStageExec nodes
    // hide scan operators from executedPlan.collect
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE prints the tree twice
    val scans = finalPlan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, finalPlan.take(600))
  }

  test("drift_psi: bins cover the corpus; a parity split (independent " +
       "of n_chars) scores near-zero drift") {
    val df = graft.operators.Validate.driftPsi(spark, dir)
    val rows = df.collect()
    assert(rows.length === 10)
    assert(rows.map(_.getInt(0)).sorted.toSeq === (0 until 10))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === n)
    // parity is independent of document length, so PSI reads as
    // small-sample noise — measured 0.096 at this SF (500 docs over 10
    // bins is ±20% jitter per cell, shrinking as 1/n at scale). The
    // bound is deliberately loose (2x the measured value) so a corpus
    // regeneration can't trip it; the DETECTION claim below is relative,
    // not absolute, for the same reason.
    val psi = rows.map(_.getDouble(3)).sum
    assert(math.abs(psi) < 0.2, s"psi=$psi")
    // and the score DETECTS a planted shift: biasing the current side
    // toward long documents through the same formula scores > 0.1
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    // current = longest 30% of docs only — a hard length shift
    val cut = src.stat.approxQuantile("n_chars", Array(0.7), 0.001)(0)
    val shifted = src.withColumn("doc_id",
      when(col("n_chars") >= cut, lit(1L)).otherwise(lit(0L)))
    // reuse the operator's math by writing the shifted frame and
    // pointing the same binning/psi pipeline at it
    val tmp = java.nio.file.Files.createTempDirectory("psidrift").toString
    shifted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val shiftedPsi = graft.operators.Validate.driftPsi(spark, tmp)
      .collect().map(_.getDouble(3)).sum
    assert(shiftedPsi > 0.3, s"planted shift scored $shiftedPsi")
    // the separation is what makes the score usable: a hard length
    // shift must dominate the no-drift noise floor by a wide margin
    assert(shiftedPsi > 3 * math.max(math.abs(psi), 0.01),
      s"shift $shiftedPsi vs noise $psi")
  }

  test("curation circuit breaker: an injected bad generation aborts " +
       "BEFORE the pipeline runs, naming every violated rule; a clean " +
       "delivery passes through unchanged") {
    import graft.operators.Curation
    // clean delivery: the gate is transparent — gated == ungated
    val gated = Curation.curatePipelineGated(spark, dir).collect().toSet
    val plain = Curation.curatePipeline(spark, dir).collect().toSet
    assert(gated === plain)

    // bad generation: append rows with NULL text and an out-of-domain
    // lang — the classes of damage a malformed crawl delivery shows
    val tmp = java.nio.file.Files.createTempDirectory("gate").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bad = docs.limit(5)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", lit(null).cast("string"))
      .withColumn("lang", lit("xx"))
    docs.unionByName(bad).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val e = intercept[Curation.GateViolation] {
      Curation.curatePipelineGated(spark, tmp)
    }
    // the abort names the violated rules with their counts
    assert(e.getMessage.contains("not_null(text)"), e.getMessage)
    assert(e.getMessage.contains("domain(lang"), e.getMessage)
    assert(e.failed.map(_._1).toSet ===
      Set("not_null(text)", "domain(lang,en|de|fr|es|zh)"), e.failed)
    assert(e.failed.forall(_._2 === 5L), e.failed)
  }
}
