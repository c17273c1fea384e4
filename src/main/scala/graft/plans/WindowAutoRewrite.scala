package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending,
  AttributeReference, Cast, ExprId, Lag, Lead, Literal, NamedExpression,
  RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project,
  Window}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.operators.{Skew, WindowSpec}

/** The SQL seam for the auto-dispatched skew window: an OPT-IN
  * optimizer rule routing the canonical lag-class window SELECT
  *
  *   SELECT pass..., lag(v,1) OVER w, lead(v,1) OVER w,
  *          row_number() OVER w
  *   FROM t WINDOW w AS (PARTITION BY k ORDER BY o1, o2, ...)
  *
  * through [[Skew.windowAutoOn]] — so a plain SQL query entering via
  * `QueryFacade`/`spark.sql` gets the profile-dispatched plan (plain
  * single window below the hot-key threshold, the chunked two-pass
  * rewrite above it) the DataFrame API already has. The replacement
  * subtree is built by the SAME operator code the registry query uses
  * (the BloomJoinRewrite splice discipline), so correctness is the
  * operator's own oracle-proven contract.
  *
  * Fires only when the shape is PROVABLY safe (the dispatch must be
  * result-invisible, which the chunked rewrite only guarantees when
  * ordering ties are full duplicates):
  *  - `spark.graft.rewriteWindowAuto=true` (opt-in: the rewrite runs a
  *    profile job and, above the threshold, a chunk-materializing job
  *    at optimization time — a plan-shape decision the user makes
  *    knowingly; same contract as RankLimitRewrite/BloomJoinRewrite);
  *  - the window expressions are EXACTLY [lag(v,1), lead(v,1),
  *    row_number()] over one shared (single-key, all-ascending) window
  *    — the lag class. The other three classes follow the same pattern
  *    and stay DataFrame-API-only until a query needs them;
  *  - every partition/order/value expression is a direct child column;
  *  - every projected passthrough column (and the lag subject) appears
  *    in the ORDERING (plus the key) — the syntactic proof that
  *    ordering ties are full duplicates, hence any tie split yields
  *    the same output multiset. A query ordering by fewer columns than
  *    it projects is NOT rewritten: its plain-window output is already
  *    tie-nondeterministic, but the rewrite must not pick a different
  *    nondeterminism;
  *  - the projection is [child passthroughs..., lag, lead, rn] in that
  *    order (the operator's output layout — renamed positionally to
  *    the query's aliases);
  *  - child column names are disjoint from the operator's scratch
  *    names (pid/lrn/... — the chunked rewrite's internals).
  * Dispatch asymmetry, which is also the FIXED-POINT argument: below
  * the profiled threshold the rule leaves the plan UNTOUCHED — the
  * query's own single-window plan IS the plain branch, so splicing
  * [[Skew.windowLagPlain]] would re-create the very shape this rule
  * matches (an endless fixed-point loop); above it the spliced
  * chunked subtree's internal windows partition by (pid, key) — two
  * expressions — so the single-key guard never re-matches our own
  * output, and the batch converges after one rewrite. The spliced
  * subtree re-aliases its output to the original expression IDs, so
  * references above the Project resolve unchanged.
  */
object WindowAutoRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteWindowAuto"

  /** Install into a session (idempotent; conf-gated either way). */
  def ensureRule(s: SparkSession): Unit = {
    val cur = s.experimental.extraOptimizations
    if (!cur.contains(WindowAutoRewrite))
      s.experimental.extraOptimizations = cur :+ WindowAutoRewrite
  }

  /** The chunked rewrite's internal column names: a child already using
    * one would be silently clobbered by withColumn — refuse instead.
    */
  private val Scratch = Set("pid", "lrn", "prev0", "next0", "cnt",
    "offset", "prev_last", "next_first", "first_q", "last_q",
    "prev_qty", "next_qty", "rn")

  /** The expression id a projection entry forwards: a direct reference,
    * or the oracle-SQL idiom `CAST(rn AS BIGINT)` (the chunked rewrite
    * emits BIGINT natively, so the cast folds into the splice).
    */
  private def fwdId(e: NamedExpression): Option[ExprId] = e match {
    case a: AttributeReference => Some(a.exprId)
    case Alias(Cast(a: AttributeReference, LongType, _, _), _) =>
      Some(a.exprId)
    case _ => None
  }

  private def lagShape(wes: Seq[NamedExpression])
      : Option[(AttributeReference, Seq[Alias])] = wes match {
    case Seq(
        a1 @ Alias(WindowExpression(
          Lag(v1: AttributeReference, Literal(1, _), Literal(null, _), false),
          _), _),
        a2 @ Alias(WindowExpression(
          Lead(v2: AttributeReference, Literal(1, _), Literal(null, _), false),
          _), _),
        a3 @ Alias(WindowExpression(_: RowNumber, _), _))
        if v1.semanticEquals(v2) =>
      Some((v1, Seq(a1, a2, a3)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transform {
      case p @ Project(pl,
          w @ Window(wes, Seq(key: AttributeReference), order, child, _))
          if order.nonEmpty &&
            order.forall(o => o.direction == Ascending &&
              o.nullOrdering ==
                org.apache.spark.sql.catalyst.expressions.NullsFirst &&
              o.child.isInstanceOf[AttributeReference]) &&
            child.output.forall(a => !Scratch.contains(a.name)) =>
        lagShape(wes) match {
          case Some((value, aliases))
              if child.outputSet.contains(value) &&
                child.outputSet.contains(key) &&
                order.forall(o => child.outputSet.contains(
                  o.child.asInstanceOf[AttributeReference])) &&
                // projection = [child passthroughs..., lag, lead, rn]
                pl.length >= 3 &&
                pl.dropRight(3).forall(e => e.isInstanceOf[AttributeReference]
                  && child.outputSet.contains(
                    e.asInstanceOf[AttributeReference])) &&
                pl.takeRight(3).map(fwdId) ==
                  aliases.map(a => Some(a.exprId)) &&
                // name-resolution safety: every role column resolves
                // unambiguously by name on the child
                (pl.dropRight(3).map(
                    _.asInstanceOf[AttributeReference].name) ++
                  order.map(_.child.asInstanceOf[AttributeReference].name)
                  ++ Seq(key.name, value.name)).distinct.forall(n =>
                    child.output.count(_.name == n) == 1) &&
                // tie safety: every output column (and the subject)
                // rides the ordering, so ties are full duplicates
                (pl.dropRight(3).map(_.exprId).toSet + value.exprId)
                  .subsetOf(order.map(
                    _.child.asInstanceOf[AttributeReference].exprId).toSet +
                    key.exprId) =>
            val s = SparkSession.getActiveSession.getOrElse(
              throw new IllegalStateException(
                "WindowAutoRewrite ran without an active SparkSession"))
            val childDf = GraftSqlBridge.ofRows(s, child)
            if (Skew.profiledShare(s, childDf, key.name) <
                Skew.WindowSkewShare) p // plain dispatch = the plan as-is
            else {
              val pass = pl.dropRight(3)
                .map(_.asInstanceOf[AttributeReference].name)
              val ordNames = order.map(
                _.child.asInstanceOf[AttributeReference].name)
              val spec = WindowSpec(
                key = key.name,
                ord = ordNames,
                value = value.name,
                rangeOrd = ordNames.head, // unused by the lag class
                out = pass,
                rangeOut = pass)
              // the stats broadcast() marks arrive as ResolvedHint
              // nodes, but the optimizer's hint-elimination batch
              // already ran before this rule — fold them into JoinHint
              // ourselves (the BloomJoinRewrite device) or the
              // physical planner rejects the plan
              val replaced =
                org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
                  Skew.windowLagSkewOn(s, childDf, spec)
                    .queryExecution.analyzed)
              // re-alias to the original output ids so references above
              // the Project resolve unchanged (names, ids AND types
              // preserved — the operator's BIGINT rn casts back down
              // when the query's rn was uncast INT)
              Project(p.output.zip(replaced.output).map { case (o, n) =>
                val e = if (n.dataType == o.dataType) n
                  else Cast(n, o.dataType)
                Alias(e, o.name)(exprId = o.exprId)
              }, replaced)
            }
          case _ => p
        }
    }
  }
}
