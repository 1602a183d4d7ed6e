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
object GuardRails {
  /** "Bounded" — the row count is provably small (or explicitly
    * capped) by construction, so a global window / cross join over it
    * is legitimate: a grouping-FREE Aggregate (one output row), an
    * explicit Limit, driver-local data, or any of those behind
    * row-preserving wrappers (project/filter/sort/repartition/sample/
    * union-of-bounded). A KEYED aggregate is deliberately NOT bounded
    * — "rank every user by their aggregate" has one output row per
    * key and is exactly the single-partition killer the window guard
    * exists for; cap it with a limit (top-k) or use the two-phase
    * global rank. Everything else is table-sized until proven
    * otherwise — the safe default at scale. */
  private[plans] def bounded(p: LogicalPlan): Boolean = p match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case _: GlobalLimit | _: LocalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case u: Project => bounded(u.child)
    case u: Filter => bounded(u.child)
    case u: Sort => bounded(u.child)
    case u: SubqueryAlias => bounded(u.child)
    case w: Window => bounded(w.child) // a window adds columns, not rows
    case h: ResolvedHint => bounded(h.child)
    case r: Repartition => bounded(r.child) // incl. coalesce
    case r: RepartitionByExpression => bounded(r.child)
    case s: Sample => bounded(s.child)
    case u: Union => u.children.forall(bounded)
    case _ => false
  }
}

object UnpartitionedWindowGuard extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.failUnpartitionedWindow"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(confKey, "true").toBoolean) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && !GuardRails.bounded(w.child) =>
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

/** Rejects condition-free cross products where NEITHER side is bounded
  * — at scale an n×m nested-loop join of two table-sized inputs never
  * finishes; the legitimate uses (a broadcast one-row aggregate total,
  * a literal frame, a capped sample) all have a bounded side and pass.
  * Matches BOTH the explicit Cross join type and a condition-free
  * Inner join: a forgotten join condition parses as Inner with
  * condition None (df.join(other), SELECT * FROM a, b) — the most
  * common accidental cartesian — and Spark 3+ no longer rejects it
  * (spark.sql.crossJoin.enabled defaults true). Joins WITH a condition
  * are left alone even when they plan as BroadcastNestedLoopJoin: an
  * inequality/range join of a bounded side is a real pattern (q30),
  * and a condition means the author said how the rows relate. */
object UnboundedCrossJoinGuard extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.failUnboundedCrossJoin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(confKey, "true").toBoolean) {
      plan.foreach {
        case j: Join if j.condition.isEmpty &&
            (j.joinType == org.apache.spark.sql.catalyst.plans.Cross ||
              j.joinType == org.apache.spark.sql.catalyst.plans.Inner) &&
            !GuardRails.bounded(j.left) && !GuardRails.bounded(j.right) =>
          throw new SparkException(
            "graft guard: cross product with no join condition and no " +
              "bounded side — an n×m product of two table-sized inputs " +
              "(a missing join condition parses as Inner with no " +
              "condition). Broadcast a bounded frame (one-row aggregate/" +
              "limit/literal) on one side, or express the relationship " +
              "as a join condition. " +
              s"(disable per session: set $confKey=false)")
        case _ => ()
      }
    }
    plan
  }
}
