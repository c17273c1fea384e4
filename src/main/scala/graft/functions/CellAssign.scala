package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Nearest-centroid cell assignment as ONE native expression holding the
  * centroid matrix as a plain reference object — the replacement for the
  * Column formulation `array_position(array(vec_l2sq(v, array(lit…)), …))`
  * whose codegen carried k×dim Literal nodes (k=1563 at the ×100 corpus:
  * ~100k literals, methods past the JIT/codegen limits, boxed
  * GenericArrayData element reads per centroid per row). Here the matrix
  * lives OUTSIDE the expression tree (one broadcast-serialized
  * `Array[Array[Double]]`), and assignment is a tight primitive loop.
  *
  * Results are BIT-IDENTICAL to the Column formulation it replaces (and
  * to the DuckDB oracle mirror, which is untouched):
  *  - each squared-L2 distance accumulates `(x_i − c_i)²` sequentially
  *    left-to-right from 0.0, elements widened to double first — exactly
  *    [[VecOps.l2sq]]'s fold;
  *  - argmin scans in centroid order with strict `<`, so the LOWEST index
  *    wins ties — exactly `array_position(dists, array_min(dists)) − 1`;
  *  - two-level mode (non-empty `superCents`) picks the strict-< argmin
  *    super first, then scans ONLY that branch's member cells in
  *    ascending-id order, returning the global cell id — exactly
  *    [[graft.operators.Ann.twoLevelStructure]]'s chained-CASE walk;
  *  - null array, null element, or a length≠dim array (which made every
  *    per-centroid `vec_l2sq` null, hence `array_min` null, hence a null
  *    position) → null.
  *
  * Two-level runtime is n·(√k + k/√k) like the CASE it replaces — the
  * win is constant-factor (no per-centroid array materialization, no
  * boxing, no 100k-literal codegen), measured at the ×100 corpus in
  * SCALING.md.
  */
case class VecCellAssign(child: Expression,
                         centroids: Seq[Seq[Double]],
                         superCents: Seq[Seq[Double]],
                         memberIds: Seq[Seq[Int]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cell_assign"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${t.simpleString}")
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val supers: Array[Array[Double]] =
    superCents.map(_.toArray).toArray
  @transient private lazy val members: Array[Array[Int]] =
    memberIds.map(_.toArray).toArray
  @transient private lazy val dim: Int = cents(0).length

  /** Sequential-fold squared L2 against centroid row `c` — the
    * [[VecOps.l2sq]] arithmetic on an already-widened query vector.
    */
  private def l2sq(x: Array[Double], c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { val d = x(i) - c(i); acc += d * d; i += 1 }
    acc
  }

  /** The per-row walk; public so generated code can call it through the
    * expression reference object. Null → caller handled; returns null
    * (boxed) on length mismatch or null element, else the cell id.
    */
  def assign(a: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != dim) return null
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    def argmin(rows: Array[Array[Double]]): Int = {
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < rows.length) {
        val d = l2sq(x, rows(c))
        if (d < bd) { bd = d; best = c } // strict <: lowest index wins
        c += 1
      }
      best
    }
    if (supers.isEmpty) Integer.valueOf(argmin(cents))
    else {
      val si = argmin(supers)
      val ids = members(si)
      var best = ids(0); var bd = Double.MaxValue
      var j = 0
      while (j < ids.length) {
        val d = l2sq(x, cents(ids(j)))
        if (d < bd) { bd = d; best = ids(j) } // ids ascending: lowest wins
        j += 1
      }
      Integer.valueOf(best)
    }
  }

  protected override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("cellAssign", this,
        classOf[VecCellAssign].getName)
      val r = ctx.freshName("cellRes")
      s"""
         |java.lang.Integer $r = $ref.assign($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecCellAssign =
    copy(child = newChild)
}
