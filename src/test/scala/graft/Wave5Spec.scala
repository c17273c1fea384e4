package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Profile, RelationalExt}

/** Invariants for the round-6 wave-5 operators: distribution-analytic
  * windows, table profiling, and containment-tier decontamination.
  */
class Wave5Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("ntile: quartile sizes within a customer differ by at most one, " +
       "pct_rank/cdist bounded and monotone in order") {
    val r = RelationalExt.windowNtile(spark, dir).collect()
    val byCust = r.groupBy(_.getLong(1))
    for ((_, rows) <- byCust) {
      val sizes = rows.groupBy(_.getLong(2)).view.mapValues(_.length)
      if (sizes.nonEmpty)
        assert(sizes.values.max - sizes.values.min <= 1)
      val ordered = rows.sortBy(_.getLong(0))
      ordered.foreach { x =>
        assert(x.getDouble(3) >= 0.0 && x.getDouble(3) <= 1.0)
        assert(x.getDouble(4) > 0.0 && x.getDouble(4) <= 1.0)
      }
      // cume_dist and quartile never decrease along the frame order
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(4) <= b.getDouble(4))
          assert(a.getLong(2) <= b.getLong(2))
        case _ =>
      }
    }
  }

  test("profile: one row per column, stats consistent, and a direct " +
       "recompute agrees for the enum column") {
    val r = Profile.profileTable(spark, dir).collect()
    assert(r.map(_.getString(0)).sorted === Profile.ProfileCols.sorted)
    val n = spark.read.parquet(s"$dir/orders.parquet").count()
    r.foreach { x =>
      assert(x.getLong(1) === n)
      assert(x.getLong(2) >= 0L)
      assert(x.getLong(3) <= x.getLong(1) - x.getLong(2))
      // lexicographic min<=max only holds for non-numeric renderings
      if (Set("o_orderpriority", "o_orderdate").contains(x.getString(0)))
        assert(x.getString(4) <= x.getString(5))
    }
    val prio = r.find(_.getString(0) == "o_orderpriority").get
    val direct = spark.read.parquet(s"$dir/orders.parquet")
      .agg(countDistinct(col("o_orderpriority")),
        min(col("o_orderpriority")), max(col("o_orderpriority")))
      .collect().head
    assert(prio.getLong(3) === direct.getLong(0))
    assert(prio.getString(4) === direct.getString(1))
    assert(prio.getString(5) === direct.getString(2))
  }

  test("first/last/nth windows: keys bound the partition, nth is null " +
       "only for singleton customers") {
    val r = RelationalExt.windowFirstLast(spark, dir).collect()
    val byCust = r.groupBy(_.getLong(1))
    for ((_, rows) <- byCust) {
      val keys = rows.map(_.getLong(0)).sorted
      rows.foreach { x =>
        assert(x.getLong(2) === keys.head)
        assert(x.getLong(3) === keys.last)
        if (keys.length >= 2) assert(x.getLong(4) === keys(1))
        else assert(x.isNullAt(4))
      }
    }
  }

  test("corr/covar: corr bounded, covar_pop = covar_samp * (n-1)/n") {
    val r = RelationalExt.aggCorr(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(math.abs(x.getDouble(1)) <= 1.0)
      val (cs, cp, n) = (x.getDouble(2), x.getDouble(3), x.getLong(4))
      assert(math.abs(cp - cs * (n - 1).toDouble / n) < 0.02,
        s"covar identity broke: $cs $cp $n")
    }
  }

  test("equi-depth histogram: 10 buckets per flag, counts near n/10, " +
       "ranges tile without overlap") {
    val r = Profile.histogramEquidepth(spark, dir).collect()
    val byFlag = r.groupBy(_.getString(0))
    for ((_, rows) <- byFlag) {
      assert(rows.length === Profile.HistBuckets)
      val total = rows.map(_.getLong(4)).sum
      // equi-depth: every bucket within 25% of the ideal tenth (ties on
      // 2-decimal prices can shift boundary mass slightly)
      rows.foreach { b =>
        val share = b.getLong(4).toDouble / total
        assert(share > 0.075 && share < 0.125, s"share $share")
      }
      // buckets tile the range in order: lo <= hi within, hi <= next lo
      val ordered = rows.sortBy(_.getLong(1))
      ordered.foreach(b => assert(b.getDouble(2) <= b.getDouble(3)))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2))
        case _ =>
      }
    }
  }

  test("equi-depth histogram, fitted at-scale variant: 10 buckets per " +
       "flag, counts near n/10 (boundary-tie tolerance)") {
    val r = Profile.histogramEquidepthFitted(spark, dir).collect()
    val byFlag = r.groupBy(_.getString(0))
    for ((_, rows) <- byFlag) {
      assert(rows.length === Profile.HistBuckets)
      val total = rows.map(_.getLong(4)).sum
      rows.foreach { b =>
        val share = b.getLong(4).toDouble / total
        assert(share > 0.05 && share < 0.15, s"share $share")
      }
    }
  }

  test("cogroup audit: status classes are consistent and all three " +
       "appear under the corruption carves") {
    val r = Profile.cogroupAudit(spark, dir).collect()
    assert(r.map(_.getString(3)).toSet === Set("ok", "childless", "orphan"))
    r.foreach { x =>
      (x.getString(3): @unchecked) match {
        case "ok" => assert(x.getBoolean(1) && x.getLong(2) > 0L)
        case "childless" => assert(x.getBoolean(1) && x.getLong(2) === 0L)
        case "orphan" => assert(!x.getBoolean(1) && x.getLong(2) > 0L)
      }
    }
    // each key appears exactly once
    assert(r.map(_.getLong(0)).distinct.length === r.length)
  }

  test("fuzzy decontamination: every probe flags back to its source " +
       "benchmark doc; the clean stream stays clean") {
    val r = Curation.decontaminateFuzzy(spark, dir).collect()
    val probes = r.filter(_.getLong(0) < 0)
    assert(probes.nonEmpty)
    probes.foreach { p =>
      assert(p.getBoolean(3), s"probe ${p.getLong(0)} not flagged")
      assert(p.getLong(1) === -p.getLong(0) - 1,
        "probe matched a different benchmark than its source")
      assert(p.getDouble(2) >= Curation.DecontamFuzzyThreshold &&
        p.getDouble(2) <= 1.0)
    }
    // the corpus itself MAY legitimately contain benchmark dups (the
    // testdata plants duplicate docs) — so the clean-stream claim is
    // verdict CONSISTENCY, not absence: flagged iff containment crosses
    // the threshold, and the flag is not vacuously universal
    r.filter(_.getLong(0) > 0).foreach { c =>
      assert(c.getBoolean(3) ===
        (c.getDouble(2) >= Curation.DecontamFuzzyThreshold))
    }
    assert(r.exists(x => x.getLong(0) > 0 && !x.getBoolean(3)))
  }
}
