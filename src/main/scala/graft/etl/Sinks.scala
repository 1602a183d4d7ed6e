package graft.etl

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** S7: hive-partitioned snappy parquet sink (SURVEY.md §2.1).
  *
  * The reference's pandas to_parquet writes a fresh GUID file per run and
  * never overwrites — de-facto append (SURVEY §1.4.4). We make the mode a
  * first-class argument; `overwrite` is the sane default for recomputed
  * layers, `append` reproduces the reference.
  */
object Sinks {
  def writePartitioned(
      df: DataFrame,
      path: String,
      mode: String = "overwrite",
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Unit = {
    df.write
      .mode(mode)
      .option("compression", compression)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** [[writePartitioned]] that also returns the row count of the written
    * frame, measured DURING the write job via the Observation API — the
    * Spark-native form of the reference's informational per-stage row
    * prints (main.py:242-247, 287, 309), at zero extra passes: a
    * `df.count()` before or after the write would re-execute the whole
    * stage plan, which at 100 TB doubles the stage. */
  def writePartitionedCounted(
      df: DataFrame,
      path: String,
      mode: String = "overwrite",
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Long = {
    val obs = Observation()
    writePartitioned(df.observe(obs, count(lit(1)).as("rows")),
      path, mode, partitionBy, compression)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Dynamic partition overwrite: replace ONLY the partitions present in
    * df, leave all others untouched — the write mode for incremental
    * recompute (a daily run that rebuilds one ano/mes does not clobber
    * seven years of history, and does not re-write 100 TB). */
  def overwritePartitionsOf(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Unit = {
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", compression)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** [[overwritePartitionsOf]] with the observed row count — see
    * [[writePartitionedCounted]] for the zero-extra-pass contract. */
  def overwritePartitionsOfCounted(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Long = {
    val obs = Observation()
    overwritePartitionsOf(df.observe(obs, count(lit(1)).as("rows")),
      path, partitionBy, compression)
    obs.get("rows").asInstanceOf[Long]
  }
}
