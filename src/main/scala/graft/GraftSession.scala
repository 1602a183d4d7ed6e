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

  /** Recommended session. `parallelism` sizes both the local master
    * and the shuffle partition count; pass `master = None` to inherit
    * an external cluster manager (spark-submit). */
  def create(parallelism: Int = Runtime.getRuntime.availableProcessors(),
      master: Option[String] = None,
      appName: String = "graft"): SparkSession = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
    master.orElse(Some(s"local[$parallelism]")).foreach(b.master)
    b.getOrCreate()
  }
}
