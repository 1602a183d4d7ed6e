package graft.etl

import org.apache.spark.sql.DataFrame

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
}
