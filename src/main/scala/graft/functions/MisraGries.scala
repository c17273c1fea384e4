package graft.functions

import scala.collection.mutable

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
  * corpus size; the full token stream is never shuffled at all. The
  * buffer is a MUTABLE HashMap updated in place: the aggregation hot
  * path sees one probe+write per token, and the over-capacity decrement
  * cascade mutates counters without rebuilding the map — an immutable
  * buffer here costs an allocation per input row (and an O(cap) rebuild
  * per miss) on a corpus-sized stream.
  */
class MisraGriesAggregator(cap: Int)
    extends Aggregator[String, mutable.HashMap[String, Long],
      Map[String, Long]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
                      v: String): mutable.HashMap[String, Long] =
    MisraGries.reduceInPlace(buf, v, cap)

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] =
    MisraGries.mergeInPlace(a, b, cap)

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
}

object MisraGries {
  /** One MG step, in place: count v, or (over capacity) decrement every
    * counter — the arriving item's implicit counter cancels against
    * them. Returns the same map.
    */
  def reduceInPlace[K](buf: mutable.HashMap[K, Long], v: K,
                       cap: Int): mutable.HashMap[K, Long] = {
    buf.get(v) match {
      case Some(c) => buf.update(v, c + 1L)
      case None if buf.size < cap => buf.update(v, 1L)
      case None =>
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  /** One MG step over an immutable map — the Structured Streaming state
    * form ([[graft.streaming.EventStreams]] keeps `Map` in its encoded
    * `GroupState`; per-trigger hot loops should copy to a mutable map
    * and use [[reduceInPlace]]).
    */
  def reduceInto[K](buf: Map[K, Long], v: K, cap: Int): Map[K, Long] =
    buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1L)
      case None if buf.size < cap => buf.updated(v, 1L)
      case None =>
        buf.iterator.map { case (k, c) => (k, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  /** Mergeable-summaries merge, in place on `a`: pointwise sum, then
    * subtract the (cap+1)-th largest counter from all and keep
    * positives — at most cap survive and each counter loses <= what a
    * sequential decrement cascade would have taken, so the N/(cap+1)
    * guarantee holds over ANY merge tree.
    */
  def mergeInPlace[K](a: mutable.HashMap[K, Long],
                      b: mutable.HashMap[K, Long],
                      cap: Int): mutable.HashMap[K, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > cap) {
      val cut = a.valuesIterator.toIndexedSeq
        .sorted(Ordering[Long].reverse)(cap)
      a.mapValuesInPlace((_, c) => c - cut)
      a.filterInPlace((_, c) => c > 0L)
    }
    a
  }

  /** Immutable-map merge (kept for state-shaped callers and property
    * tests over arbitrary merge trees).
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
