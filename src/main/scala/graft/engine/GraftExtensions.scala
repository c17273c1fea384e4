package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BpeEncode, BpeOps, Md5Prefix60, RabinFingerprint,
  RabinWinnow, VecCosine, VecDot, VecL2sq, WordShingles}

/** SparkSessionExtensions entry point — the engine's functions become
  * available to ANY session configured with
  * `spark.sql.extensions=graft.engine.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the standard injection
  * mechanism for operator/function extensions (SURVEY.md §2.2: the
  * reference's extensibility point is a Rust trait registry; ours is
  * this). The function set here MUST stay in lockstep with
  * `GraftFunctions.register` — both seams expose the same surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
               build: Seq[Expression] => Expression): Unit =
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), build))

    inject("rabin_fingerprint", classOf[RabinFingerprint],
      es => RabinFingerprint(es.head, 8))
    inject("rabin_winnow", classOf[RabinWinnow],
      es => RabinWinnow(es.head, 8, 16))
    inject("word_shingles", classOf[WordShingles],
      es => WordShingles(es.head, graft.functions.GraftFunctions.shingleN(es)))
    inject("bpe_encode", classOf[BpeEncode],
      es => BpeEncode(es.head, BpeOps.vocabFromArgs(es)))
    inject("md5_prefix60", classOf[Md5Prefix60], es => Md5Prefix60(es.head))
    inject("vec_dot", classOf[VecDot], es => VecDot(es(0), es(1)))
    inject("vec_cosine", classOf[VecCosine], es => VecCosine(es(0), es(1)))
    inject("vec_l2sq", classOf[VecL2sq], es => VecL2sq(es(0), es(1)))
    // custom physical operator (LogicalPlan -> Strategy -> SparkPlan):
    // sessions without extensions get it lazily via
    // TopKPlans.ensureStrategy
    e.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    // optimizer rule (opt-in via spark.graft.rewriteRankLimit): rank-
    // filter windows with an unused rank column become GroupedTopK
    e.injectOptimizerRule(_ => graft.plans.RankLimitRewrite)
    // optimizer rule (opt-in via spark.graft.rewriteBloomJoin): plain
    // star joins get the portable Bloom fact-side pre-filter injected
    e.injectOptimizerRule(_ => graft.plans.BloomJoinRewrite)
    // optimizer rule (opt-in via spark.graft.rewriteWindowAuto): the
    // canonical window-class SELECT entering as plain SQL gets the
    // profile-dispatched chunked rewrite above the hot-key threshold.
    // Routed through extraOptimizations (the LAST optimizer batch)
    // rather than the operator-optimization FIXED POINT this injection
    // seam feeds: the rule runs a plan-time profile job and splices an
    // already-OPTIMIZED subtree, so in the fixed point it would re-pay
    // the profile job per batch iteration and have its splice
    // re-optimized — the cost model documented at the splice site
    // holds only for the last batch. The builder runs once per session
    // at optimizer construction, making this the extension-path twin
    // of WindowAutoRewrite.ensureRule; the rule handed back to the
    // fixed point is an inert shim.
    e.injectOptimizerRule { session =>
      graft.plans.WindowAutoRewrite.ensureRule(session)
      graft.plans.WindowAutoRewrite.Registered
    }
  }
}
