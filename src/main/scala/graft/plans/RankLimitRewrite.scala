package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast,
  Expression, IntegerLiteral, LessThan, LessThanOrEqual, Literal,
  RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule completing the extension-point triad (function
  * injection + planner strategy + `Rule[LogicalPlan]`): rewrites the
  * ubiquitous "top k per key" window idiom
  *
  *   Project(cols without rn,
  *     Filter(rn <= k,
  *       Window([rn := row_number() OVER (PARTITION BY g ORDER BY o)])))
  *
  * into the bounded-heap [[GroupedTopK]] operator, eliminating the
  * window's full per-partition sort (Spark's own InferWindowGroupLimit
  * prunes rows but still sorts — see the GroupedTopK scaladoc). The
  * rewrite fires only when the rank column is provably unused above the
  * filter (the surrounding Project references child columns only), the
  * partition spec is non-empty (global top-k already has
  * TakeOrderedAndProject), and every expression involved is
  * deterministic.
  *
  * OPT-IN via `spark.graft.rewriteRankLimit=true`: GroupedTopK trades
  * the sort for a per-task distinct-key memory contract, which is a
  * plan-shape decision the user makes knowingly — silently changing
  * every capped-bucket query's plan under a default-on rule would
  * bypass that contract (and this repo's plan-pin specs exist to catch
  * exactly such drift).
  */
object RankLimitRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteRankLimit"

  /** k such that `cond` is rank <= k over `rn`, unwrapping int casts. */
  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = {
    def isRn(e: Expression): Boolean = e match {
      case a: Attribute => a.semanticEquals(rn)
      case Cast(a: Attribute, _, _, _) => a.semanticEquals(rn)
      case _ => false
    }
    cond match {
      case LessThanOrEqual(e, IntegerLiteral(k)) if isRn(e) => Some(k)
      case LessThan(e, IntegerLiteral(k)) if isRn(e) => Some(k - 1)
      case LessThanOrEqual(e, Literal(k: Long, _)) if isRn(e) &&
        k <= Int.MaxValue => Some(k.toInt)
      case LessThan(e, Literal(k: Long, _)) if isRn(e) &&
        k <= Int.MaxValue => Some(k.toInt - 1)
      case _ => None
    }
  }

  /** Spark's InferWindowGroupLimit may already have planted its pruning
    * node below the window; the heap subsumes it, so strip it rather
    * than stacking the two.
    */
  private def stripGroupLimit(child: LogicalPlan): LogicalPlan =
    child match {
      case WindowGroupLimit(_, _, _, _, c) => c
      case c => c
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transform {
      case p @ Project(pl,
          Filter(cond, Window(
            Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)),
            part, order, child, _)))
          if part.nonEmpty && order.nonEmpty &&
            part.forall(_.deterministic) &&
            order.forall(_.deterministic) &&
            pl.forall(_.references.subsetOf(
              stripGroupLimit(child).outputSet)) =>
        rankLimit(cond, a.toAttribute) match {
          case Some(k) if k > 0 =>
            Project(pl, GroupedTopK(part, order, k, stripGroupLimit(child)))
          case _ => p
        }
    }
  }
}
