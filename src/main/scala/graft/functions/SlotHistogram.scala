package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-defined aggregate: dense count histogram over a bounded
  * slot domain [0, slots). One int-array buffer per group, O(1) work per
  * input row and O(slots) per merge — the shape a per-document
  * signature aggregation needs (Dedup's containment count-signature):
  * the SQL alternatives are either `slots` predicate evaluations per
  * row (a wide sum(when) — measured ~0.7 s slower at sf0.1 for 128
  * slots) or a sparse (key, slot) pre-aggregation plus a
  * collect_list/map fold (object-heavy, ~2 s slower). Map-side
  * combinable, so shuffle traffic per group is O(slots) regardless of
  * group size.
  */
class SlotHistogram(slots: Int)
    extends Aggregator[Int, Array[Int], Seq[Int]] {

  override def zero: Array[Int] = new Array[Int](slots)

  override def reduce(buf: Array[Int], slot: Int): Array[Int] = {
    buf(slot) += 1
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < slots) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Seq[Int] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

object SlotHistogram {
  /** Column form: usable in groupBy().agg(); input column must be an
    * INT already bounded to [0, slots).
    */
  def slotHistogram(slots: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new SlotHistogram(slots),
      Encoders.scalaInt)
}
