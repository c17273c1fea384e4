package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingling as a native Catalyst expression.
  *
  * The higher-order-function formulation (`transform(sequence(...),
  * i => concat_ws(" ", slice(tokens, i, n)))`) is interpreted — no codegen,
  * a fresh lambda evaluation per shingle — and measured ~4 s for 1.5 MB of
  * text at sf0.1, an ~100x overhead that would dominate a 100 TB corpus
  * pass. This expression produces the identical result in one tight Java
  * loop inside whole-stage codegen: the MinHash shingle pass runs at scan
  * speed.
  *
  * Semantics (bit-identical to the Column formulation it replaces):
  * lowercase → whitespace-split → drop empty tokens → consecutive n-token
  * windows joined by single spaces → distinct preserving first occurrence;
  * fewer than n tokens → one shingle of all tokens joined.
  */
object ShingleOps {
  private val Ws = Pattern.compile("\\s+")

  def wordShingles(text: UTF8String, n: Int): GenericArrayData = {
    val raw = Ws.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    var m = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) m += 1; i += 1 }
    val toks = new Array[String](m)
    i = 0; m = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(m) = raw(i); m += 1 }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]
    if (m >= n) {
      val sb = new java.lang.StringBuilder
      i = 0
      while (i + n <= m) {
        sb.setLength(0)
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        seen.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    } else {
      seen.add(UTF8String.fromString(String.join(" ", toks: _*)))
    }
    new GenericArrayData(seen.toArray)
  }
}

/** The first 60 bits of md5 as a long, computed from the digest bytes
  * directly — exactly `conv(substring(md5(s), 1, 15), 16, 10)` (and
  * DuckDB's `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`), minus the
  * 32-char hex string allocation and the string→long parse. The dedup
  * signature passes (simhash votes, minhash family seeds) call this once
  * per token/shingle over the whole corpus, so the per-call savings are
  * a corpus-pass-sized win.
  */
object Md5Ops {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def prefix60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    // 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xf0L) >>> 4)
  }
}

/** `md5_prefix60(s)` → BIGINT: first 15 hex chars of md5 as a long. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix60"
  protected override def nullSafeEval(input: Any): Any =
    Md5Ops.prefix60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.prefix60($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

/** `word_shingles(text)` → ARRAY<STRING>: distinct n-word shingles. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  protected override def nullSafeEval(input: Any): Any =
    ShingleOps.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
