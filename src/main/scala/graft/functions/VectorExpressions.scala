package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> as native Catalyst
  * expressions. The higher-order-function formulation
  * (`aggregate(zip_with(...))`) is INTERPRETED — a fresh lambda frame per
  * element, no whole-stage codegen — and dominated the pair-verify stages
  * of dedup_embedding / ann_* (measured: the 400k-pair cosine stage of
  * dedup_embedding at sf0.1 spent seconds in lambda evaluation that a
  * tight loop does in tens of milliseconds). These expressions produce
  * BIT-IDENTICAL results: each element is widened to double before
  * multiplying and the accumulation is sequential left-to-right from 0.0,
  * exactly the fold order of the Column formulation they replace (and of
  * the DuckDB oracle's list_ functions) — so hash-green queries stay
  * hash-green.
  *
  * Null semantics mirror the HOF versions: null input array → null,
  * length mismatch → null (zip_with pads with null → null product → null
  * sum), any null element → null.
  */
object VecOps {
  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private def anyNull(a: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements()) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  def dot(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, i, af) * elem(b, i, bf); i += 1 }
    acc
  }

  /** dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in one pass, fold order of
    * each accumulator identical to three separate HOF aggregates.
    */
  def cosine(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, af); val y = elem(b, i, bf)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2sq(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dxy = elem(a, i, af) - elem(b, i, bf)
      acc += dxy * dxy
      i += 1
    }
    acc
  }
}

/** Shared shape of the binary vector ops: ARRAY x ARRAY → DOUBLE, null on
  * null/mismatched input, codegen delegating to one VecOps loop.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // Reject wrong argument types at ANALYSIS time with a readable message
  // — without this, the mismatch surfaces as an opaque codegen/eval
  // failure mid-query.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case ArrayType(org.apache.spark.sql.types.NullType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** VecOps method name — also the SQL-facing prettyName suffix. */
  protected def op: String

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    // empty array literal (`array()`) — no elements are ever read
    case ArrayType(org.apache.spark.sql.types.NullType, _) => false
    case t => throw new IllegalArgumentException(
      s"vec_$op expects ARRAY<FLOAT|DOUBLE>, got $t")
  }

  override def prettyName: String = s"vec_$op"

  // Dispatch and element-type flags hoisted out of the per-row path —
  // interpreted evaluation (constant folding, non-codegen fallbacks)
  // must not allocate a closure or re-inspect dataTypes per row.
  @transient private lazy val evalFn
      : (ArrayData, Boolean, ArrayData, Boolean) => java.lang.Double =
    op match {
      case "dot" => VecOps.dot
      case "cosine" => VecOps.cosine
      case "l2sq" => VecOps.l2sq
    }
  @transient private lazy val leftIsFloat = isFloat(left)
  @transient private lazy val rightIsFloat = isFloat(right)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    evalFn(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecRes")
      s"""
         |java.lang.Double $r = graft.functions.VecOps.$op(
         |  $a, ${isFloat(left)}, $b, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

/** `vec_dot(a, b)` → DOUBLE: sequential double-precision dot product. */
case class VecDot(left: Expression, right: Expression)
    extends VecBinaryExpression {
  protected def op: String = "dot"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(left = l, right = r)
}

/** `vec_cosine(a, b)` → DOUBLE: cosine similarity, one fused pass. */
case class VecCosine(left: Expression, right: Expression)
    extends VecBinaryExpression {
  protected def op: String = "cosine"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecCosine = copy(left = l, right = r)
}

/** `vec_l2sq(a, b)` → DOUBLE: squared L2 distance (IVF probe metric). */
case class VecL2sq(left: Expression, right: Expression)
    extends VecBinaryExpression {
  protected def op: String = "l2sq"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecL2sq = copy(left = l, right = r)
}
