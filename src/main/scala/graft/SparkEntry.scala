package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DataOpsQueries, ExtendedQueries, NamedQuery, PipelineQueries, RelationalQueries}

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
      DataOpsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.q01GoldAgg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    NamedQuery.registry(inventory)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-defined ops (minhash /
    * simhash / LSH buckets) → driver records a rows-only check. */
  def oracleSql: Map[String, String] = NamedQuery.oracles(inventory)
}
