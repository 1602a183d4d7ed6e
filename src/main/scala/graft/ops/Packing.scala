package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: lay documents out in a
  * deterministic order and cut the stream into bins of ~budget tokens,
  * so short documents share a training sequence instead of wasting pad
  * tokens.
  *
  * This is OFFSET packing, the shuffle-friendly relaxation of bin
  * packing: within each stratum, docs are ordered by the content-keyed
  * uniform (see [[Sampling.hashUniform]] — deterministic, re-run- and
  * engine-stable) and doc d goes to bin floor(start_offset(d) / budget),
  * where start_offset is the running token total before d. Properties:
  *   - one shuffle (the per-stratum window sort) — no driver state, no
  *     sequential bin assignment bottleneck;
  *   - deterministic: same corpus → same bins, on any partitioning and
  *     in any engine (the running sum is integer-exact);
  *   - every bin's content is contiguous in the layout order, so a
  *     downstream writer can concatenate bin members directly;
  *   - a doc longer than the budget gets a bin of its own starting at
  *     its offset (callers filter or split oversized docs first if hard
  *     sequence caps matter).
  */
object Packing {

  /** (id, stratum, n_tokens, bin_id) — see object doc. */
  def packByOffset(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(Sampling.hashUniform(col(textCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(stratumCol), col(textCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        floor((col("_cum") - col("n_tokens")) / budgetTokens).cast("long").as("bin_id"))
  }
}
