package graft

/** The per-query bench drift gate, factored out of [[Bench]] so a spec
  * can prove it FIRES. Round-10 shipped the gate inline with a regex
  * that required the number immediately after the colon — but every
  * committed `BENCH_full_prev.json` is pretty-printed with a space
  * (`"q01_gold_agg": 0.329`), so the parser matched NOTHING and every
  * `drift_flagged: 0` was vacuous (round-10 verdict, What's wrong #1:
  * five 1.5–1.8× rows went unadjudicated). Two rules fall out:
  *   - the parser tolerates arbitrary whitespace after the colon;
  *   - a baseline file that EXISTS but parses to zero query entries is
  *     a loud error, never a silent pass — a gate that can disarm
  *     itself is worse than no gate (the round-7 verify_local
  *     NO_OUTPUT lesson, applied to the bench).
  */
object BenchDrift {

  /** Keys in the bench JSON that are not per-query seconds. */
  private val meta = Set("value", "n_queries", "n", "rc", "cpus", "sf", "drift_flagged")

  /** Parse a previous round's full bench map (the `"name": seconds`
    * pairs) out of a JSON text, tolerating pretty-printed whitespace.
    * Regex, not a JSON library, on purpose: the file is machine-written
    * by [[Bench]] itself with string keys and plain numbers only, and
    * the build has no JSON dependency to add. */
  def parseBaseline(txt: String): Map[String, Double] = {
    val kv = """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9][0-9.eE+-]*)""".r
    kv.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filterNot { case (k, _) => meta(k) }
      .toMap
  }

  /** Flag rule: current >= `ratio` × previous AND current >= `floorSec`
    * (below the floor, scheduling jitter dominates and a "regression"
    * is noise). Failed queries (negative seconds) never flag. */
  def flag(results: Seq[(String, Double)], prev: Map[String, Double],
      ratio: Double = 1.5, floorSec: Double = 0.3): Seq[(String, Double, Double)] =
    results.flatMap { case (k, v) =>
      prev.get(k) match {
        case Some(p) if p > 0 && v >= ratio * p && v >= floorSec => Some((k, p, v))
        case _ => None
      }
    }
}
