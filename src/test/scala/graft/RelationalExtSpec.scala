package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalExt

class RelationalExtSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within the documented error bound") {
    // the query emits the verdict itself (rel_err_ok = within
    // ApproxRelErrBound of exact) — the same TRUE the oracle asserts
    val rows = RelationalExt.aggApproxDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(r.getBoolean(2), r.toString) }
  }

  test("approx_percentile lands within the verdict bound of exact") {
    val rows = graft.operators.RelationalExt
      .aggApproxQuantile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"), s"p50 out of bound: $r")
      assert(r.getAs[Boolean]("p95_ok"), s"p95 out of bound: $r")
      assert(r.getAs[Double]("p50_price") > 0.0)
      assert(r.getAs[Double]("p95_price") >= r.getAs[Double]("p50_price"))
    }
  }

  test("cross join cardinality is |nation| x |region|") {
    assert(RelationalExt.joinCross(spark, dir).count() === 25L * 5L)
  }

  test("full outer keeps customers without big orders (null right side)") {
    val df = RelationalExt.joinFullOuter(spark, dir)
    assert(df.filter(col("n_big").isNull).count() > 0L)
    assert(df.count() >=
      spark.read.parquet(s"$dir/customer.parquet").count())
  }

  test("offset_limit returns rows 51..75 of the total order") {
    val all = spark.read.parquet(s"$dir/orders.parquet")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey").collect().map(_.getLong(0))
    val got = RelationalExt.offsetLimit(spark, dir)
      .collect().map(_.getLong(0))
    assert(got.toSeq === all.slice(50, 75).toSeq)
  }

  test("ntile buckets are balanced within 1 per partition") {
    val df = RelationalExt.windowLagLead(spark, dir)
      .groupBy("l_suppkey", "bucket4").count()
      .groupBy("l_suppkey")
      .agg((max("count") - min("count")).as("spread"))
    assert(df.filter(col("spread") > 1).count() === 0L)
  }
}
