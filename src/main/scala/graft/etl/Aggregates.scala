package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1–A5: the reference's aggregate surface (SURVEY.md §2.4). */
object Aggregates {

  /** A1 — the flagship gold aggregation (main.py:300-307): group by
    * (ano, mes, key) and sum the measure. The reference's pandas groupby
    * drops null-keyed groups (dropna=True); Spark keeps them — with the
    * silver pipeline's fillna(0) + partition-derived keys the difference
    * is moot (SURVEY §2.4), and we keep Spark's (SQL-standard) behavior.
    */
  def goldAggregate(silver: DataFrame, keyCol: String = "nome_orgao",
      valueCol: String = "valor"): DataFrame =
    silver
      .groupBy(col("ano"), col("mes"), col(keyCol))
      // exact integer-cents sum (valor is 2-decimal money): raw
      // sum(double) is shuffle-order-dependent in the last ulps, which
      // would make incremental vs full recompute of identical data
      // bit-diverge (graft.Exact scaladoc)
      .agg(graft.Exact.moneySum(col(valueCol)).as("total_gasto"))

  /** A2–A5 — the console EDA (main.py:241-249) as ONE aggregate pass
    * instead of four separate actions; returns a one-row DataFrame. */
  def summarize(df: DataFrame, keyCol: String = "nome_orgao",
      dateCol: String = "data_pagamento", valueCol: String = "valor"): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(keyCol)).as(s"n_distinct_$keyCol"),
      min(col(dateCol)).as("min_date"),
      max(col(dateCol)).as("max_date"),
      round(avg(col(valueCol)), 2).as("mean_value"))
}
