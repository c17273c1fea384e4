package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-defined aggregate: top-k values per group, kept as a small
  * sorted (descending) buffer. The reference has NO UDAF surface
  * (README.md:73-75); this is the `Aggregator[IN, BUF, OUT]` extension
  * point the Spark mapping calls for (SURVEY.md §2.2).
  *
  * The buffer is bounded at k elements through every reduce/merge, so the
  * aggregation is map-side-combinable and shuffle traffic per group is
  * O(k) — the property that makes per-group top-k viable at 100 TB where
  * collect+sort is not.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    insert(buf, v)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
    if (buf.length >= k && v <= buf.last) buf
    else {
      val i = buf.indexWhere(_ < v) match {
        case -1 => buf.length
        case x => x
      }
      (buf.take(i) :+ v) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column form: usable in groupBy().agg(). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      Encoders.scalaDouble)
}
