package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: Morton mapping round-trips, and each coarse bucket is
  * a tight rectangle in BOTH key dimensions — the property that makes
  * parquet min/max pruning fire for predicates on either key.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  /** Reference de-interleave of the even/odd bit lanes. */
  private def deinterleave(z: Long): (Long, Long) = {
    var (a, b) = (0L, 0L)
    (0 until Layout.ZBits).foreach { i =>
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (a, b)
  }

  test("zval de-interleaves back to (partkey, suppkey) low bits") {
    val mask = (1L << Layout.ZBits) - 1L
    Layout.zorderLayout(spark, dir).limit(2000).collect().foreach { r =>
      val (a, b) = deinterleave(r.getAs[Long]("zval"))
      assert(a === (r.getAs[Long]("l_partkey") & mask))
      assert(b === (r.getAs[Long]("l_suppkey") & mask))
    }
  }

  test("each zbucket spans a bounded rectangle in both dimensions") {
    // bucket = top 10 interleaved bits = top 5 bits of each key, so
    // within one bucket either key spans < 2^(ZBits-5) values
    val span = 1L << (Layout.ZBits - 5)
    val bad = Layout.zorderLayout(spark, dir)
      .groupBy(col("zbucket"))
      .agg((max(col("l_partkey")) - min(col("l_partkey"))).as("pk_span"),
        (max(col("l_suppkey")) - min(col("l_suppkey"))).as("sk_span"))
      .filter(col("pk_span") >= span || col("sk_span") >= span)
      .count()
    assert(bad === 0L)
  }

  test("property: zInterleave round-trips arbitrary key pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val mask = (1L << Layout.ZBits) - 1L
    val pairs = Seq.fill(500)((rnd.nextLong().abs, rnd.nextLong().abs))
    val df = pairs.toDF("a", "b").select(col("a"), col("b"),
      Layout.zInterleave(col("a").bitwiseAND(lit(mask)),
        col("b").bitwiseAND(lit(mask))).as("z"))
    df.collect().foreach { r =>
      val (a, b) = deinterleave(r.getAs[Long]("z"))
      assert(a === (r.getAs[Long]("a") & mask))
      assert(b === (r.getAs[Long]("b") & mask))
    }
  }

  test("property: zInterleave round-trips at production width (zBits=26)") {
    // the 100 TB key domain: partkey to 67M needs 26 bits; zvals are
    // 52-bit and must still de-interleave exactly
    import spark.implicits._
    val zb = 26
    def deinter(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      (0 until zb).foreach { i =>
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val rnd = new scala.util.Random(7)
    val mask = (1L << zb) - 1L
    val pairs = Seq.fill(500)((rnd.nextLong().abs & mask,
      rnd.nextLong().abs & mask)) :+ ((mask, mask)) :+ ((0L, mask))
    val df = pairs.toDF("a", "b").select(col("a"), col("b"),
      Layout.zInterleave(col("a"), col("b"), zb).as("z"))
    df.collect().foreach { r =>
      val (a, b) = deinter(r.getAs[Long]("z"))
      assert(a === r.getAs[Long]("a"))
      assert(b === r.getAs[Long]("b"))
    }
  }

  test("zorderLayout fails loudly on keys past the ZBits bound") {
    // a key past 2^ZBits must raise, not silently alias (the guard that
    // protects the rectangle property at scale)
    import spark.implicits._
    val wide = Seq((1L, 1L, (1L << Layout.ZBits) + 5L, 3L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("zguard").toString
    wide.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val e = intercept[Exception] {
      Layout.zorderLayout(spark, tmp).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("key out of")))
  }

  test("zorderWrite clusters: each range partition holds a contiguous z-range") {
    import spark.implicits._
    val parted = Layout.zorderWrite(Layout.zorderLayout(spark, dir), 8)
      .select(col("zval"))
      .mapPartitions(it => Iterator.single(
        it.map(_.getLong(0)).foldLeft((Long.MaxValue, Long.MinValue, true,
          Long.MinValue)) { case ((lo, hi, sorted, prev), z) =>
          (math.min(lo, z), math.max(hi, z), sorted && z >= prev, z)
        }))
      .collect()
      .filter(t => t._1 != Long.MaxValue)
    // sorted within every partition
    assert(parted.forall(_._3))
    // partitions cover disjoint z-ranges
    val ranges = parted.map(t => (t._1, t._2)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
