package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-visible query: a Spark plan builder over a testdata dir,
  * plus (when SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver cross-checks against at sf0.01.
  *
  * Determinism contract for oracle-bearing queries:
  *   - every output column is aliased identically on both sides;
  *   - integer outputs are long/BIGINT on both sides;
  *   - double outputs are either raw (untouched by aggregation) or
  *     derived from exact integer arithmetic (see graft.Exact), so the
  *     value is bit-identical regardless of partitioning/merge order.
  */
final case class NamedQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object NamedQuery {
  def registry(qs: Seq[NamedQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracles(qs: Seq[NamedQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
