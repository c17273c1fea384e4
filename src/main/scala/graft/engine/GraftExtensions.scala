package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{RabinFingerprint, RabinWinnow, WordShingles}

/** SparkSessionExtensions entry point — the engine's functions become
  * available to ANY session configured with
  * `spark.sql.extensions=graft.engine.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the standard injection
  * mechanism for operator/function extensions (SURVEY.md §2.2: the
  * reference's extensibility point is a Rust trait registry; ours is
  * this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rabin_fingerprint"),
      new ExpressionInfo(classOf[RabinFingerprint].getName,
        "rabin_fingerprint"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RabinFingerprint(exprs.head, 8)))
    e.injectFunction((
      new FunctionIdentifier("rabin_winnow"),
      new ExpressionInfo(classOf[RabinWinnow].getName, "rabin_winnow"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RabinWinnow(exprs.head, 8, 16)))
    e.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles(exprs.head,
          graft.functions.GraftFunctions.shingleN(exprs))))
    e.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[graft.functions.BpeEncode].getName,
        "bpe_encode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BpeEncode(exprs.head,
          if (exprs.length > 1)
            graft.functions.BpeOps.loadVocab(exprs(1).eval().toString)
          else graft.functions.BpeOps.Default)))
  }
}
