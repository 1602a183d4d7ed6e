package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DataOpsQueries, ExtendedQueries, GraphQueries, NamedQuery, PipelineQueries, RelationalQueries, SignalQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory: PipelineQueries (reference-parity operators,
  * SURVEY §2.1–§2.6), RelationalQueries (engine capabilities, SURVEY
  * §2.7), DataOpsQueries (training-data ops: dedup / similarity / text /
  * multimodal). Each NamedQuery optionally carries its DuckDB oracle SQL.
  */
object SparkEntry {
  val inventory: Seq[NamedQuery] =
    PipelineQueries.all ++ RelationalQueries.all ++ ExtendedQueries.all ++
      TpchQueries.all ++ DataOpsQueries.all ++ GraphQueries.all ++
      SignalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.q01GoldAgg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    NamedQuery.registry(inventory)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The minhash/simhash family (d02, d03, d04,
    * d09) is oracle-checked via the portable md5 hash chain (see
    * graft.functions.Md5Mix); the SRP-LSH ANN family (d07, d08) via the
    * md5-derived Rademacher plane matrix (Similarity.planeMatrix); d10
    * via a fully deterministic integer k-means whose three iterations the
    * oracle unrolls as CTEs (Similarity.ivfTopKPortable); and m02/m03's
    * stub decode is byte-length-deterministic, so even the mapPartitions
    * plumbing is oracle-checked.
    * EVERY registered query carries an oracle — none is rows-only. The
    * one historical exception (q37, engine-native approx sketches whose
    * estimates are engine-defined) was retired in round 7 in favor of
    * its portable twin q59; the native approx_count_distinct /
    * approx_percentile error bounds stay asserted in SkewJoinSpec. */
  def oracleSql: Map[String, String] = NamedQuery.oracles(inventory)
}
