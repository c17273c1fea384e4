package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Top-N nearest-centroid cells for a query vector, as ONE native
  * expression holding the centroid matrix as a plain reference object —
  * the probe-side sibling of [[VecCellAssign]]. Replaces the probe
  * formulation `explode(array(struct(lit cell, array(lit…)), …))` +
  * `row_number over (partition by q_id order by dist)` whose literal
  * tree carried k×dim nodes (the exact blowup VecCellAssign was
  * introduced to avoid on the assignment side — ~100k literal nodes at
  * the ×100 corpus's k=1563) and whose window rank cost one shuffle of
  * (queries × k) rows per probe. Here the ranking is a per-row
  * primitive loop and the plan needs NO exchange at all for probe
  * selection.
  *
  * Semantics, stated so an independent engine can mirror them exactly
  * (the DuckDB oracle generator in SparkEntry interpolates the same
  * cached centroid literals and recomputes this walk):
  *  - FLAT mode (`superCents` empty): distances to ALL k cells, return
  *    the n nearest ordered by (squared-L2 asc, cell id asc) — exactly
  *    the old window `row_number() OVER (ORDER BY dist ASC, cell ASC)
  *    <= n`, with each distance the sequential left-to-right
  *    accumulation of `(x_i − c_i)²` from 0.0 ([[VecOps.l2sq]]'s fold,
  *    elements widened to double first).
  *  - TWO-LEVEL mode: rank the super-centroids by (squared-L2 asc,
  *    branch index asc); walk that ranking taking the SMALLEST prefix
  *    of supers whose cumulative member-cell count reaches
  *    `overscan × n` (or every super if the total is smaller); then
  *    rank ONLY those branches' member cells exactly as in flat mode.
  *    Per-row cost is ~(#supers + prefix members) ≈ 2√k·overscan-ish
  *    instead of k — the same coarse-then-fine economics as
  *    [[VecCellAssign]]'s assignment walk, generalized from argmin to
  *    top-n.
  *  - null array, null element, or length≠dim → null (explode drops
  *    the row; the corpus has no null embeddings, and a null query
  *    selecting arbitrary cells — the old window's NULLS FIRST rank —
  *    was never meaningful).
  */
case class VecCellTopN(child: Expression,
                       centroids: Seq[Seq[Double]],
                       superCents: Seq[Seq[Double]],
                       memberIds: Seq[Seq[Int]],
                       n: Int,
                       overscan: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cell_topn"

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

  private def l2sq(x: Array[Double], c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { val d = x(i) - c(i); acc += d * d; i += 1 }
    acc
  }

  /** Insert cell `id` with distance `d` into the running top-n held in
    * (ds, ids, size), ordered by (d asc, id asc) — a bounded insertion
    * sort; n is small (a probe count), so this beats any heap.
    */
  private def insertTopN(ds: Array[Double], ids: Array[Int], size: Int,
                         d: Double, id: Int): Int = {
    val cap = ds.length
    if (size == cap && (d > ds(size - 1) ||
        (d == ds(size - 1) && id > ids(size - 1)))) return size
    var pos = if (size < cap) size else size - 1
    while (pos > 0 && (d < ds(pos - 1) ||
        (d == ds(pos - 1) && id < ids(pos - 1)))) {
      ds(pos) = ds(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    ds(pos) = d; ids(pos) = id
    math.min(size + 1, cap)
  }

  /** The per-row walk; public so generated code can call it through the
    * expression reference object.
    */
  def topCells(a: ArrayData): GenericArrayData = {
    val len = a.numElements()
    if (len != dim) return null
    val x = new Array[Double](len)
    var i = 0
    while (i < len) {
      if (a.isNullAt(i)) return null
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val cap = math.min(n, cents.length)
    val ds = new Array[Double](cap)
    val ids = new Array[Int](cap)
    var size = 0
    if (supers.isEmpty) {
      var c = 0
      while (c < cents.length) {
        size = insertTopN(ds, ids, size, l2sq(x, cents(c)), c)
        c += 1
      }
    } else {
      // rank ALL supers by (dist asc, branch asc): full insertion order
      val s = supers.length
      val sds = new Array[Double](s)
      val ord = new Array[Int](s)
      var si = 0
      while (si < s) { sds(si) = l2sq(x, supers(si)); ord(si) = si; si += 1 }
      // insertion sort of branch indices by (dist, branch) — s ≈ √k
      var p = 1
      while (p < s) {
        val oi = ord(p); val od = sds(oi)
        var q = p - 1
        while (q >= 0 && (sds(ord(q)) > od ||
            (sds(ord(q)) == od && ord(q) > oi))) {
          ord(q + 1) = ord(q); q -= 1
        }
        ord(q + 1) = oi
        p += 1
      }
      // smallest prefix whose cumulative member count reaches the
      // overscan target (all supers if the total never does)
      val target = overscan.toLong * n
      var cum = 0L
      var pi = 0
      while (pi < s && cum < target) {
        val ids2 = members(ord(pi))
        var j = 0
        while (j < ids2.length) {
          val cid = ids2(j)
          size = insertTopN(ds, ids, size, l2sq(x, cents(cid)), cid)
          j += 1
        }
        cum += ids2.length
        pi += 1
      }
    }
    val out = new Array[Any](size)
    var k = 0
    while (k < size) { out(k) = ids(k); k += 1 }
    new GenericArrayData(out)
  }

  protected override def nullSafeEval(input: Any): Any =
    topCells(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("cellTopN", this,
        classOf[VecCellTopN].getName)
      val r = ctx.freshName("topCells")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  $ref.topCells($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecCellTopN =
    copy(child = newChild)
}
