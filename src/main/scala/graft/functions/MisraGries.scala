package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequency sketch as a typed `Aggregator` — the second
  * mergeable-sketch family next to HLL (`sketch_merge`): capacity-bounded
  * counters whose merge is pointwise-sum + rank-(cap+1) subtraction (the
  * mergeable-summaries formulation, Agarwal et al., PODS 2012). The
  * deterministic guarantee the oracle verdict leans on: estimates never
  * exceed true counts, and undercount at most N/(cap+1) over any
  * reduce/merge tree — so the verdict holds on every partitioning, which
  * is what makes a partition-order-dependent sketch hash-checkable via
  * the exact-count + in-bound-verdict device (`agg_approx_distinct`).
  *
  * Scale shape: the buffer is O(cap) through every reduce and merge —
  * map-side combinable, O(cap) shuffle bytes per task regardless of
  * corpus size; the full token stream is never shuffled at all.
  */
class MisraGriesAggregator(cap: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    MisraGries.reduceInto(buf, v, cap)

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeMaps(a, b, cap)

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
}

object MisraGries {
  /** One MG step: count v, or (over capacity) decrement every counter —
    * the arriving item's implicit counter cancels against them.
    */
  def reduceInto[K](buf: Map[K, Long], v: K, cap: Int): Map[K, Long] =
    buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1L)
      case None if buf.size < cap => buf.updated(v, 1L)
      case None =>
        buf.iterator.map { case (k, c) => (k, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  /** Mergeable-summaries merge: pointwise sum, then subtract the
    * (cap+1)-th largest counter from all and keep positives — at most
    * cap survive and each counter loses <= what a sequential decrement
    * cascade would have taken, so the N/(cap+1) guarantee holds over
    * ANY merge tree.
    */
  def mergeMaps[K](a: Map[K, Long], b: Map[K, Long],
                   cap: Int): Map[K, Long] = {
    val summed = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (summed.size <= cap) summed
    else {
      val cut = summed.valuesIterator.toIndexedSeq.sorted(
        Ordering[Long].reverse)(cap)
      summed.iterator.map { case (k, c) => (k, c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Column form: usable in agg(). */
  def mgSketch(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGriesAggregator(cap),
      Encoders.STRING)
}
