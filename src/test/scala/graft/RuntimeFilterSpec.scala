package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RuntimeFilter

/** Bloom-filter semi-join reduction: result parity with the plain join,
  * zero false negatives, and a genuine pre-shuffle reduction.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("bloom-reduced join equals the plain join exactly") {
    val bloom = RuntimeFilter.bloomJoin(spark, dir)
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_orderpriority"))
    assert(bloom.count() === plain.count())
    assert(bloom.except(plain).count() === 0L)
    assert(plain.except(bloom).count() === 0L)
  }

  test("no false negatives; prefilter reduces the fact stream") {
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val words = RuntimeFilter.bloomBuild(dim, "o_orderkey")
    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
    val passed = RuntimeFilter
      .bloomMightContain(fact, "l_orderkey", words)
    val nFact = fact.count()
    val nPass = passed.count()
    val nTrue = fact.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    // soundness: every true match passes the filter
    assert(passed.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count() === nTrue)
    assert(nPass >= nTrue)
    // reduction: ~20% of orders are urgent, so the filter should drop
    // most of the fact table; at sf0.001 (~300 keys in a 2^18-bit
    // filter) the false-positive rate is negligible
    assert(nPass < nFact / 2, s"pass=$nPass of $nFact — no reduction")
    assert(nPass - nTrue <= nFact / 100,
      s"false positives ${nPass - nTrue} exceed 1% of $nFact")
  }

  test("property: arbitrary key sets never produce a false negative") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // adversarial-ish keys: negatives, zero, near-collisions, huge values
    val keys = (Seq(0L, -1L, Long.MaxValue, Long.MinValue + 1) ++
      Seq.fill(300)(rnd.nextLong())).distinct
    val dim = keys.toDF("k")
    val words = RuntimeFilter.bloomBuild(dim, "k")
    val probes = (keys ++ Seq.fill(300)(rnd.nextLong())).distinct.toDF("k")
    val passed = RuntimeFilter.bloomMightContain(probes, "k", words)
      .collect().map(_.getLong(0)).toSet
    // every inserted key passes, regardless of sign or magnitude
    keys.foreach(k => assert(passed.contains(k), s"false negative on $k"))
  }

  test("bloom word table stays tiny (broadcastable at any corpus size)") {
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"))
    val words = RuntimeFilter.bloomBuild(dim, "o_orderkey")
    assert(words.count() <= RuntimeFilter.BloomBits / 64)
  }
}
