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

  test("z-order data skipping MEASURED: the same selective filter reads " +
       "strictly fewer rows off a z-ordered copy than a naturally-" +
       "ordered one, on EITHER key — via executed-plan scan metrics") {
    import graft.exec.QueryMetrics
    // sf0.01 for real key domains (partkey 0..1999 = 11 bits, suppkey
    // 0..99 = 7 bits) — unequal widths, so the test also proves the
    // zAligned equal-weight device: raw interleave lets partkey's high
    // bits own every z split and suppkey never prunes
    val src = "/root/testdata/sf0.01"
    val base = spark.read.parquet(s"$src/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .withColumn("zval", Layout.zInterleave(
        Layout.zAligned(col("l_partkey"), 11),
        Layout.zAligned(col("l_suppkey"), 7)))
    val tmp = java.nio.file.Files.createTempDirectory("zskip").toString
    val nFiles = 32
    // natural layout: the typical ingest order (sorted by orderkey) —
    // footer min/max on partkey/suppkey then spans ~the whole domain in
    // every file, so stats prune nothing
    base.drop("zval").repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$tmp/natural")
    // z-ordered layout: same rows, same schema, zorderWrite clustering
    Layout.zorderWrite(base, nFiles).drop("zval")
      .write.mode("overwrite").parquet(s"$tmp/zorder")
    // each output file is a single row group (far below the 128 MB
    // block), so footer-stat pruning decides per FILE; the parquet
    // reader's pushed predicate skips whole row groups whose min/max
    // exclude the range, and the scan's numOutputRows counts only the
    // surviving groups' rows — the exact skipping measurement
    def scanned(path: String, pred: org.apache.spark.sql.Column): Long =
      QueryMetrics.profile(
        spark.read.parquet(path).filter(pred)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")))
        .scanRows
    for ((name, pred) <- Seq(
        ("partkey", col("l_partkey") >= 256L && col("l_partkey") < 512L),
        ("suppkey", col("l_suppkey") >= 32L && col("l_suppkey") < 48L))) {
      // both layouts must agree on the ANSWER...
      val a = spark.read.parquet(s"$tmp/natural").filter(pred).count()
      val b = spark.read.parquet(s"$tmp/zorder").filter(pred).count()
      assert(a === b, s"$name: layouts disagree")
      assert(a > 0, s"$name: degenerate predicate")
      // ...but the z-ordered copy must READ much less to produce it
      val nat = scanned(s"$tmp/natural", pred)
      val z = scanned(s"$tmp/zorder", pred)
      assert(nat === 60000L,
        s"$name: natural layout should read everything, read $nat")
      assert(z * 2 <= nat,
        s"$name: z-order read $z of $nat — skipping did not fire")
      info(f"$name%s: z-order scanned $z%d rows vs $nat%d natural " +
        f"(${100.0 * z / nat}%.1f%%)")
    }
  }
}
