package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine-level scale guards, injected as Catalyst optimizer rules.
  *
  * The repo's PlanPropertiesSpec walks every REGISTERED query's physical
  * plan asserting no single-partition shuffle of unaggregated data — but
  * that only protects the queries the spec knows about. This rule makes
  * the same contract a property of the SESSION: any query a user writes
  * against an opted-in session fails fast at optimization time if it
  * contains the one pattern that reliably kills jobs at 100 TB — a
  * window function with an EMPTY partition spec over unbounded input,
  * which Spark plans as an Exchange SinglePartition of the whole table
  * through one task. (The round-5 q60 regression was exactly this; the
  * scale-safe alternative is ops/Ranking.globalRowNumber's two-phase
  * rank.)
  *
  * Opt-in paths:
  *   - spark.sql.extensions=graft.functions.GraftExtensions (production)
  *   - spark.experimental.extraOptimizations :+= UnpartitionedWindowGuard
  * Opt-out per session: set spark.graft.failUnpartitionedWindow=false.
  *
  * "Bounded" input — where a global window is legitimate because the
  * driver-side row count is already small — is recognized through
  * transparent wrappers: an Aggregate (the global-agg partial pattern),
  * an explicit Limit, or driver-local data (LocalRelation /
  * OneRowRelation). Everything else is table-sized until proven
  * otherwise, which is the safe default at scale.
  */
object UnpartitionedWindowGuard extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.failUnpartitionedWindow"

  @annotation.tailrec
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: GlobalLimit | _: LocalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case u: Project => bounded(u.child)
    case u: Filter => bounded(u.child)
    case u: Sort => bounded(u.child)
    case u: SubqueryAlias => bounded(u.child)
    case w: Window => bounded(w.child) // a window adds columns, not rows
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(confKey, "true").toBoolean) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
          throw new SparkException(
            "graft guard: window function with an empty PARTITION BY over " +
              "unbounded input — this plans as a single-partition exchange " +
              "of the whole table through one task. Partition the window, " +
              "pre-aggregate its input, or use the two-phase " +
              "graft.ops.Ranking.globalRowNumber for a global rank. " +
              s"(disable per session: set $confKey=false)")
        case _ => ()
      }
    }
    plan
  }
}
