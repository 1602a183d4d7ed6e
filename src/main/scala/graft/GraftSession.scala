package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: one call returns a SparkSession wired the
  * way every graft surface expects —
  *
  *   - `graft.functions.GraftExtensions` applied: the SQL function
  *     surface (graft_minhash_md5, graft_dot, …) plus both engine
  *     guard rails (unpartitioned-window and unbounded-cross-join
  *     rejection at optimization time; per-session opt-outs documented
  *     on `graft.plans.GuardRails`);
  *   - AQE on (runtime broadcast/skew re-planning is load-bearing for
  *     the join-heavy inventory);
  *   - UTC session timezone (the oracle determinism contract — date
  *     rendering must not depend on host locale);
  *   - driver-side partition listing up to 1024 dirs (hive layouts in
  *     the tens-of-dirs range pay a distributed listing job per read
  *     under the 32-dir default — the round-6 medallion finding);
  *   - shuffle partitions sized to the given parallelism rather than
  *     the 200 default (a local/parallelism-proportional count; on a
  *     real cluster pass the executor-core total).
  *
  * The harness mains (Bench/Verify/…) keep their own builders — their
  * configs are part of the measured/driver contract — but set the same
  * keys; this entry point is for LIBRARY users. */
object GraftSession {

  /** Recommended session. `parallelism` sizes both the local-fallback
    * master and the shuffle partition count. Master resolution, in
    * order: an explicit `master` argument wins; otherwise a
    * `spark.master` already configured by the environment (spark-submit
    * sets the system property) is INHERITED untouched; only when
    * neither exists does the session fall back to local[parallelism] —
    * so calling create() inside a spark-submit'd app never silently
    * downgrades a cluster master to local.
    *
    * If a SparkSession already exists, session EXTENSIONS cannot be
    * applied retroactively — create() detects that case FIRST and
    * returns the existing session with the same contract delivered
    * through the late-binding paths: the SQL functions register through
    * the session's FunctionRegistry and the guard rules append to
    * experimental.extraOptimizations (both idempotent). The TUNING
    * confs (timezone, shuffle partitions, AQE, listing threshold) are
    * deliberately NOT applied on this path: getOrCreate would silently
    * rewrite the inherited session's modifiable confs — resetting a
    * cluster session's shuffle parallelism to this machine's CPU count
    * and its timezone to UTC mid-flight. An inherited session keeps its
    * owner's tuning; only a session create() itself builds gets the
    * graft defaults. */
  def create(parallelism: Int = Runtime.getRuntime.availableProcessors(),
      master: Option[String] = None,
      appName: String = "graft"): SparkSession = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    // the reuse signal must be session IDENTITY, not registry state
    // (another caller may have registered the functions on a session
    // that still lacks the guards) — and the check must run BEFORE any
    // builder with .config touches the session, not after
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        graft.functions.TextHashExpressions.register(s) // idempotent
        val rules: Seq[org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
          Seq(graft.plans.UnpartitionedWindowGuard,
            graft.plans.UnboundedCrossJoinGuard)
        val missing = rules.filterNot(s.experimental.extraOptimizations.contains)
        if (missing.nonEmpty) {
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations ++ missing
        }
        s
      case None =>
        val b = SparkSession.builder()
          .appName(appName)
          .withExtensions(new graft.functions.GraftExtensions)
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.shuffle.partitions", parallelism.toString)
          .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        master match {
          case Some(m) => b.master(m)
          case None if sys.props.get("spark.master").isEmpty =>
            b.master(s"local[$parallelism]")
          case None => () // inherit the environment's spark.master
        }
        b.getOrCreate()
    }
  }
}
