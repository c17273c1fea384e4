package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprinting as native Catalyst expressions.
  *
  * The reference has no function surface at all (README.md:73-75 unchecked;
  * its only expression engine is the interpreted `compute_value.rs`). The
  * north star asks for document fingerprinting via rolling hashes; a Scala
  * UDF would box every row, so these are implemented as `UnaryExpression`s
  * with `doGenCode` — the generated Java calls the static helpers below
  * directly, keeping the whole pipeline inside whole-stage codegen. At
  * 100 TB this is the difference between a scan-speed fingerprint pass and
  * a serialization-bound one.
  */
object RabinHash {
  /** FNV-64 prime as the polynomial base; arithmetic wraps (mod 2^64). */
  final val B = 0x100000001b3L

  /** Minimum k-gram Rabin hash over the byte string — a single stable
    * 64-bit document fingerprint.
    */
  def minKgram(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    var i = 0
    if (n <= k) {
      var h = 0L
      while (i < n) { h = h * B + (bytes(i) & 0xff); i += 1 }
      return h
    }
    var pow = 1L
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    var min = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * pow) * B + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Winnowing (Schleimer et al., SIGMOD'03): keep the minimum k-gram hash
    * of every w-hash window, deduplicating consecutive picks — a compact,
    * position-robust fingerprint set for near-duplicate detection.
    */
  def winnow(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length
    if (n == 0) return Array.empty[Long]
    if (n <= k) return Array(minKgram(bytes, k))
    val m = n - k + 1
    val hs = new Array[Long](m)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * pow) * B + (bytes(i) & 0xff)
      hs(i - k + 1) = h
      i += 1
    }
    if (m <= w) return Array(hs.min)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var last = Long.MinValue
    var start = 0
    while (start + w <= m) {
      var mn = hs(start)
      var j = start + 1
      while (j < start + w) { if (hs(j) < mn) mn = hs(j); j += 1 }
      if (out.isEmpty || mn != last) { out += mn; last = mn }
      start += 1
    }
    out.toArray
  }
}

/** `rabin_fingerprint(text)` → BIGINT: min k-gram rolling hash. */
case class RabinFingerprint(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rabin_fingerprint"
  protected override def nullSafeEval(input: Any): Any =
    RabinHash.minKgram(input.asInstanceOf[UTF8String].getBytes, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RabinHash.minKgram($c.getBytes(), $k)")
  override protected def withNewChildInternal(newChild: Expression): RabinFingerprint =
    copy(child = newChild)
}

/** `rabin_winnow(text)` → ARRAY<BIGINT>: winnowed fingerprint set. */
case class RabinWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rabin_winnow"
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      RabinHash.winnow(input.asInstanceOf[UTF8String].getBytes, k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.RabinHash.winnow($c.getBytes(), $k, $w))")
  override protected def withNewChildInternal(newChild: Expression): RabinWinnow =
    copy(child = newChild)
}

/** SQL registration so `expr("rabin_fingerprint(text)")` / spark.sql work. */
object GraftFunctions {
  /** `word_shingles(text[, n])` — n must be a foldable int literal. */
  private[graft] def shingleN(es: Seq[Expression]): Int =
    if (es.length > 1) es(1).eval().asInstanceOf[Number].intValue() else 3

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rabin_fingerprint",
      es => RabinFingerprint(es.head, 8), "built-in")
    reg.createOrReplaceTempFunction("rabin_winnow",
      es => RabinWinnow(es.head, 8, 16), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es.head, shingleN(es)), "built-in")
    reg.createOrReplaceTempFunction("bpe_encode",
      es => BpeEncode(es.head, BpeOps.vocabFromArgs(es)), "built-in")
    reg.createOrReplaceTempFunction("md5_prefix60",
      es => Md5Prefix60(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => VecCosine(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2sq",
      es => VecL2sq(es(0), es(1)), "built-in")
  }
}
