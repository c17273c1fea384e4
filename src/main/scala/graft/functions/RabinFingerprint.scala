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
    winnowHashes(hs, w)
  }

  /** The windowing half of winnow, over an already-computed gram-hash
    * stream — factored out so the SQL-expressible md5-gram formulation
    * (TextFunctions.windowMins, used by the oracle-checked queries) can
    * be pinned algorithm-equivalent to this path in a spec.
    */
  def winnowHashes(hs: Array[Long], w: Int): Array[Long] = {
    val m = hs.length
    if (m == 0) return Array.empty[Long]
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

/** Compiled twin of the md5-gram winnowing SQL device
  * (TextFunctions.gramHashes/windowMins/winnowCount): value-identical to
  * the interpreted higher-order-function formulation — and therefore to
  * the DuckDB oracle that mirrors it — but one codegen'd call per row
  * with an O(m) monotonic-deque sliding min instead of per-window slice
  * allocations (measured 44 s -> ~1 s on dedup_winnow at sf0.1).
  * Equivalence to both the SQL formulation and RabinHash.winnowHashes is
  * pinned in WinnowSpec.
  */
object Md5WinnowOps {

  /** md5-prefix60 hash of every k-CHAR gram, position order; empty text
    * -> empty, text shorter than one gram -> one whole-text hash (the
    * same edges as the SQL device and RabinHash).
    */
  def gramHashes(s: UTF8String, k: Int): Array[Long] = {
    val n = s.numChars()
    if (n == 0) return Array.empty[Long]
    val m = n - k + 1
    if (m < 1) return Array(Md5Ops.prefix60(s))
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = Md5Ops.prefix60(s.substring(i, i + k)); i += 1 }
    out
  }

  /** Sliding-window minima (window w) via a monotonic index deque —
    * O(m), not O(m*w); values identical to min-of-each-slice.
    */
  def windowMins(hs: Array[Long], w: Int): Array[Long] = {
    val m = hs.length
    if (m == 0) return hs
    if (m <= w) return Array(hs.min)
    val out = new Array[Long](m - w + 1)
    val idx = new Array[Int](m)
    var head = 0
    var tail = 0
    var i = 0
    while (i < m) {
      while (tail > head && hs(idx(tail - 1)) >= hs(i)) tail -= 1
      idx(tail) = i
      tail += 1
      if (idx(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = hs(idx(head))
      i += 1
    }
    out
  }

  /** Distinct window minima in first-occurrence order — exactly
    * `array_distinct(windowMins(gramHashes(text)))`.
    */
  def winnowSet(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val wins = windowMins(gramHashes(s, k), w)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    wins.foreach(seen.add(_))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Consecutive-deduped winnow pick count (Schleimer et al. output
    * length) — exactly TextFunctions.winnowCount.
    */
  def winnowCount(s: UTF8String, k: Int, w: Int): Int = {
    val wins = windowMins(gramHashes(s, k), w)
    if (wins.isEmpty) return 0
    var c = 1
    var i = 1
    while (i < wins.length) { if (wins(i) != wins(i - 1)) c += 1; i += 1 }
    c
  }

  /** Minimum gram hash (the single document fingerprint); MinValue
    * sentinel is never produced by md5-prefix60 (60-bit non-negative),
    * so callers map empty -> null at the expression layer.
    */
  def gramMin(s: UTF8String, k: Int): Long = {
    val hs = gramHashes(s, k)
    if (hs.isEmpty) Long.MinValue else hs.min
  }
}

/** `md5_winnow_set(text)` → ARRAY<BIGINT>: distinct winnowed md5-gram
  * fingerprints (first-occurrence order).
  */
case class Md5WinnowSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_winnow_set"
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5WinnowOps.winnowSet(input.asInstanceOf[UTF8String], k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Md5WinnowOps.winnowSet($c, $k, $w))")
  override protected def withNewChildInternal(newChild: Expression): Md5WinnowSet =
    copy(child = newChild)
}

/** `md5_winnow_count(text)` → INT: consecutive-deduped winnow pick count. */
case class Md5WinnowCount(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_winnow_count"
  protected override def nullSafeEval(input: Any): Any =
    Md5WinnowOps.winnowCount(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5WinnowOps.winnowCount($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Md5WinnowCount =
    copy(child = newChild)
}

/** `md5_gram_min(text)` → BIGINT: minimum md5 gram hash (null for empty
  * text — matching `array_min` over an empty hash stream).
  */
case class Md5GramMin(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "md5_gram_min"
  protected override def nullSafeEval(input: Any): Any = {
    val v = Md5WinnowOps.gramMin(input.asInstanceOf[UTF8String], k)
    if (v == Long.MinValue) null else v
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Md5WinnowOps.gramMin($c, $k);
      if (${ev.value} == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Md5GramMin =
    copy(child = newChild)
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

  /** The second argument of a `fn(toks, n)` builder, validated at
    * resolution time: exactly two arguments and a foldable integral
    * literal, or a descriptive AnalysisException naming the function —
    * a bare `es(1).eval()` on a column reference evaluates an
    * unresolved expression (raw eval/cast error), and `es(1)` on a
    * one-argument call throws IndexOutOfBounds.
    */
  private[graft] def literalIntArg(fn: String, es: Seq[Expression]): Int = {
    if (es.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          s"$fn requires exactly 2 arguments (tokens, n), got ${es.length}"))
    val arg = es(1)
    if (!arg.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          (s"$fn requires a literal integer as its second argument, " +
            s"got non-foldable expression ${arg.sql}")))
    arg.eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            (s"$fn requires a literal integer as its second argument, " +
              s"got $other")))
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rabin_fingerprint",
      es => RabinFingerprint(es.head, 8), "built-in")
    reg.createOrReplaceTempFunction("rabin_winnow",
      es => RabinWinnow(es.head, 8, 16), "built-in")
    reg.createOrReplaceTempFunction("md5_winnow_set",
      es => Md5WinnowSet(es.head,
        TextFunctions.WinnowK, TextFunctions.WinnowW), "built-in")
    reg.createOrReplaceTempFunction("md5_winnow_count",
      es => Md5WinnowCount(es.head,
        TextFunctions.WinnowK, TextFunctions.WinnowW), "built-in")
    reg.createOrReplaceTempFunction("md5_gram_min",
      es => Md5GramMin(es.head, TextFunctions.WinnowK), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es.head, shingleN(es)), "built-in")
    reg.createOrReplaceTempFunction("bpe_encode",
      es => BpeEncode(es.head, BpeOps.vocabFromArgs(es)), "built-in")
    reg.createOrReplaceTempFunction("md5_prefix60",
      es => Md5Prefix60(es.head), "built-in")
    reg.createOrReplaceTempFunction("word_ngrams",
      es => WordNgrams(es.head, literalIntArg("word_ngrams", es)),
      "built-in")
    reg.createOrReplaceTempFunction("gram_rungs",
      es => GramRungs(es.head, literalIntArg("gram_rungs", es)),
      "built-in")
    reg.createOrReplaceTempFunction("gram_top_frac",
      es => GramTopFrac(es.head, literalIntArg("gram_top_frac", es)),
      "built-in")
    reg.createOrReplaceTempFunction("gram_dup_frac",
      es => GramDupFrac(es.head, literalIntArg("gram_dup_frac", es)),
      "built-in")
    reg.createOrReplaceTempFunction("cdc_chunk_texts",
      es => CdcChunkTexts(es.head, literalIntArg("cdc_chunk_texts", es)),
      "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => VecCosine(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2sq",
      es => VecL2sq(es(0), es(1)), "built-in")
  }
}
