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

  /** Sliding-window token chunking — the splitting counterpart of
    * packing: each doc becomes ceil-many overlapping chunks of up to
    * `chunkSize` tokens, chunk i starting at token i·stride (overlap =
    * chunkSize − stride). Entirely narrow (split → explode → slice, zero
    * shuffles): a scan stays a scan at any corpus size. Chunk count per
    * doc is ⌊(n−1)/stride⌋+1 — every token lands in ≥ 1 chunk and no
    * chunk starts past the end. Null texts yield no rows; an EMPTY text
    * yields one chunk holding a single empty token, because the
    * repo-wide split-tokenizer convention has split("", " ") = [""]
    * (size 1) — consistent with the DuckDB oracle and with n_tokens
    * elsewhere. Output: (id, chunk_idx, n_chunk_tokens, chunk_text). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride ($stride) <= chunkSize ($chunkSize) — a stride past " +
        "the chunk end would silently drop the tokens between chunks")
    df.select(col(idCol), split(col(textCol), " ").as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0),
          ((size(col("_toks")) - 1) / lit(stride)).cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("_toks"), col("chunk_idx") * stride + 1, lit(chunkSize)).as("_chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("_chunk")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))
  }

  /** (id, stratum, n_tokens, bin_id) — see object doc.
    *
    * The running token total is a DISTRIBUTED prefix sum, not one window
    * over the whole stratum: a naive Window.partitionBy(stratum) puts
    * every row of a stratum in a single task — with a handful of
    * languages over 100 TB that is a 20 TB sort on one executor. Instead
    * the layout order (u, id) is cut into `buckets` salt ranges (bucket =
    * ⌊u·B⌋, monotone in u, so the global order is unchanged), the running
    * sum runs per balanced (stratum, bucket) group, and each bucket's
    * exclusive base offset comes from a tiny per-bucket totals aggregate
    * (strata × buckets rows) broadcast back onto the stream. Output is
    * bit-identical to the single-window form — same total order, same
    * integer arithmetic — which is what the DuckDB oracle still checks.
    *
    * Balance caveat: the salt bucket is ⌊u·B⌋ with u keyed on the TEXT,
    * so byte-identical duplicate texts all share one u and land in one
    * (stratum, bucket) group — a heavily-duplicated corpus re-creates
    * the single-task skew this rewrite removes (correctness unaffected).
    * The bucket split cannot tiebreak on id without breaking
    * monotonicity with the (u, id) layout order, so balance assumes
    * near-distinct texts; pipelines dedup (d01/d09) before packing,
    * which is also what keeps bins from filling with copies.
    */
  def packByOffset(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, budgetTokens: Long, buckets: Int = 256): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    layoutOffsets(df, idCol, textCol, stratumCol, buckets)
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        // integer div, not floor(double /): a double quotient is exact
        // only below 2^53 — the file's integer-exact contract, applied
        // to its own bin id
        expr(s"start_offset div ${budgetTokens}L").as("bin_id"))
  }

  /** (id, stratum, n_tokens, start_offset): each doc's exclusive running
    * token offset within its stratum's deterministic (u(text), id)
    * layout order — the DISTRIBUTED prefix sum under [[packByOffset]]
    * (balanced salt-range windows + a broadcast base-offset table; see
    * the scale/balance notes there), exposed because budgeted corpus
    * assembly ([[Sampling.budgetedAssembly]]) needs the raw offsets
    * rather than the bin ids. */
  def layoutOffsets(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, buckets: Int = 256): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // NULL text = a zero-token document, not a vanishing row: it hashes
    // as the empty string (deterministic placement) and contributes 0
    // to every offset. Without the coalesces, hashUniform(NULL) -> NULL
    // _u -> NULL _bkt and the offset join dropped the row silently —
    // the same row-loss class as the segmentedRunningSum null-key bug
    // (null STRATA, by contrast, were always preserved as their own
    // layout group).
    // eager localCheckpoint: base feeds TWO consumers (the per-bucket
    // running-sum window and the bucket-totals aggregate) — without it
    // each branch re-scans the corpus and re-tokenizes + re-md5-hashes
    // every text (plan-audited: 2 FileScans at sf0.001). The
    // materialized frame is NARROW — id, stratum, and three numbers,
    // never the text — the semDedup/g01 managed-lifetime rule.
    val base = df.select(col(idCol), col(stratumCol),
        coalesce(size(split(col(textCol), " ")).cast("long"), lit(0L)).as("n_tokens"),
        Sampling.hashUniform(coalesce(col(textCol), lit(""))).as("_u"))
      .withColumn("_bkt", floor(col("_u") * buckets).cast("int"))
      .localCheckpoint(true)
    // local running sum within each balanced (stratum, bucket) group
    val wLocal = Window.partitionBy(col(stratumCol), col("_bkt"))
      .orderBy(col("_u"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("_cum_local", sum(col("n_tokens")).over(wLocal))
    // exclusive prefix of bucket totals within the stratum (tiny frame:
    // one row per (stratum, bucket))
    val wBase = Window.partitionBy(col(stratumCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy(col(stratumCol), col("_bkt"))
      .agg(sum(col("n_tokens")).as("_tot"))
      .withColumn("_base", sum(col("_tot")).over(wBase) - col("_tot"))
      .select(col(stratumCol), col("_bkt"), col("_base"))
    // null-safe on BOTH keys: a null stratum is a legitimate window
    // group (and _bkt, though non-null by construction now, costs
    // nothing to join null-safely)
    val off = offsets
      .withColumnRenamed(stratumCol, "_off_stratum")
      .withColumnRenamed("_bkt", "_off_bkt")
    local.join(broadcast(off),
        col(stratumCol) <=> col("_off_stratum") && col("_bkt") <=> col("_off_bkt"))
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        (col("_base") + col("_cum_local") - col("n_tokens")).as("start_offset"))
  }
}
