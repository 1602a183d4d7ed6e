package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data curation.
  *
  * Every decision is a pure function of row CONTENT, not of RNG state:
  * u(key) = (md5_upper(key) >>> 11) / 2^53, a uniform double in [0, 1)
  * built from the same little-endian md5 half as the dedup hash chain
  * (graft.functions.Md5Mix). Consequences that matter at 100 TB:
  *   - re-running the sample yields byte-identical output (no seed
  *     plumbing, no partition-order sensitivity — unlike df.sample,
  *     whose draw depends on row order within partitions);
  *   - appending new data never flips the verdict on existing rows, so
  *     incremental pipelines can sample shards independently;
  *   - identical texts sample identically — consistent with dedup;
  *   - the exact sample is reproducible in DuckDB SQL
  *     ((md5_number_upper(key) >> 11) / 9007199254740992.0), so sampling
  *     operators are hash-exact oracle-checkable.
  *
  * The division is by a power of two and the mantissa fits in 53 bits,
  * so u is FP-exact on both engines — a `u < rate` cut is deterministic.
  */
object Sampling {

  /** Uniform [0,1) derived from a string column's content. */
  def hashUniform(key: Column): Column =
    call_function("shiftrightunsigned",
      graft.functions.TextHashExpressions.md5Upper(key), lit(11))
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Content-keyed Bernoulli sample: keep rows with u(key) < rate. */
  def uniformSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.where(hashUniform(col(keyCol)) < lit(rate))

  /** Per-stratum rates — the balancing pass of a corpus pipeline (e.g.
    * downsample the dominant language while keeping the tail): rows in a
    * stratum missing from `rates` sample at `defaultRate`. Narrow (no
    * shuffle): the rate is a when-chain over the stratum column. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.where(hashUniform(col(keyCol)) < rate)
  }

  /** Deterministic global shuffle + shard for training-data export: the
    * "shuffle the corpus, split into N files" step every pretraining run
    * needs, without RNG. Each row's shard is floor(u(key)·n) — a pure
    * function of content, so re-runs and engine re-implementations
    * produce the identical layout — and its position within the shard is
    * the rank by (u, id), a total order (idCol must be unique; u alone
    * ties for byte-identical texts).
    *
    * Scale shape: one hash-partition exchange on `shard` (n ≈ target
    * file count) + an in-shard sort — exactly the shuffle a
    * repartition(n).sortWithinPartitions export would cost, but with a
    * deterministic, resumable assignment instead of round-robin. The
    * caveat of [[Packing.packByOffset]] applies: byte-identical
    * duplicates share u and therefore a shard — dedup first. */
  def shuffleShard(df: DataFrame, idCol: String, keyCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val u = hashUniform(col(keyCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("_u"), col(idCol))
    df.withColumn("_u", u)
      .withColumn("shard", floor(col("_u") * nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_u")
  }

  /** Deterministic cap of n rows per key — the scalable "reservoir":
    * rank rows within each key by (u(sortKey), id) and keep the first n.
    * One shuffle on the key; no RNG; stable under re-runs and across
    * engines. `idCol` must be unique per row — it is what keeps the
    * order total when two rows share identical sortKey content (u and
    * sortKey alone would tie, and row_number over a tie is
    * partition-order-dependent).
    *
    * Skew note: the row_number ≤ n filter plans as WindowGroupLimit on
    * BOTH sides of the exchange (verified in the d14 physical plan), so
    * each map task ships at most n rows per key — a dominant key costs
    * n·partitions shuffled rows, not its full population. The
    * stratum-sized-single-task ceiling that bites naive per-key windows
    * does not apply here. */
  def capPerKey(df: DataFrame, keyCol: String, sortKeyCol: String,
      idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashUniform(col(sortKeyCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= n)
      .drop("_rk")
  }

  /** Temperature-based mixture weights across corpus strata (sources):
    * weight_i ∝ n_tokens_i^0.5, the α = 0.5 temperature-sampling rule
    * that upweights small sources relative to proportional sampling —
    * plus each source's share and its token allocation under
    * `budgetTokens`. The exponent is fixed at 0.5 because sqrt is
    * IEEE-correctly-rounded on every engine while pow(x, α) is not —
    * a generic α would be engine-specific.
    *
    * Float determinism: sqrt(n_tokens) is quantized to integer MICROS
    * (round ×1e6 → long) so the normalizing total is an exact integer
    * sum, and share = w_micro/total is one IEEE division of longs.
    * The whole-frame window SUM runs over the per-stratum aggregate —
    * #strata rows, not corpus rows — so the single-task frame is
    * scale-safe by construction. */
  def mixtureWeights(df: DataFrame, stratumCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    val wAll = Window.partitionBy()
    df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
      .withColumn("w_micro",
        round(sqrt(col("n_tokens").cast("double")) * 1e6, 0).cast("long"))
      .withColumn("total_micro", sum(col("w_micro")).over(wAll))
      .select(col("stratum"), col("n_docs"), col("n_tokens"), col("w_micro"),
        (col("w_micro").cast("double") / col("total_micro")).as("share"),
        round((col("w_micro").cast("double") / col("total_micro")) * budgetTokens, 0)
          .cast("long").as("sampled_tokens"))
  }
}
