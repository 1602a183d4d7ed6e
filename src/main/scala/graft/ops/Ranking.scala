package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe global ranking.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY is the
  * classic single-task trap: Spark plans it as Exchange SinglePartition
  * + Window, so ONE task sorts and numbers every row — a dead job at
  * 100 TB. The distributed equivalent is the two-phase rank:
  *
  *   1. range-repartition on the order key and sort within partitions —
  *      a parallel global sort (each of N tasks sorts 1/N of the data,
  *      partition i's keys all precede partition i+1's);
  *   2. one tiny job counts rows per partition (N rows to the driver —
  *      constant driver state, like an AQE stats exchange);
  *   3. a driver-side exclusive prefix sum of those counts gives each
  *      partition's rank offset, folded back in as a literal map;
  *   4. the final rank is a ZERO-shuffle narrow projection: the local
  *      index comes from `monotonically_increasing_id()`, whose public
  *      contract is (partitionId << 33) + within-partition counter, so
  *      `mid − (pid << 33)` is the 0-based position in iterator order —
  *      which IS the sorted order after step 1.
  *
  * The frame is localCheckpoint'ed between steps so the count job and
  * the rank projection see the SAME partitioning and row order (the
  * checkpoint also means downstream consumers that re-evaluate the
  * frame — e.g. a recursive CTE inlining it per step — re-read
  * materialized partitions instead of re-sorting).
  *
  * Determinism: ranks are deterministic iff `orderCols` is a total
  * order (e.g. includes a unique key). With ties, tied rows receive
  * distinct but arbitrary consecutive ranks — same contract as
  * `row_number`, whose tie order is equally arbitrary.
  */
object Ranking {

  /** Bits `monotonically_increasing_id` reserves for the per-partition
    * counter (documented in its Spark scaladoc: "the lower 33 bits").
    */
  private val MidCounterBits = 33

  /** Top-`k` rows by `orderCols` with a 1-based `rankCol` — the
    * WINDOWLESS form of the `orderBy().limit(k)` + unpartitioned
    * `row_number` idiom. The TakeOrdered result is ≤ k rows by
    * construction, so it is collapsed to one partition, re-sorted
    * locally (free at that size, and robust if the upstream plan stops
    * guaranteeing output order), and numbered in iterator order via
    * `monotonically_increasing_id` — partition 0's counter is the
    * 0-based position. Same determinism contract as `row_number`: ranks
    * are stable iff `orderCols` is a total order. Exists because every
    * unpartitioned-window plan fires a WindowExec warning that drowns
    * bench/verify log tails even when the input is provably bounded. */
  def rankTop(df: DataFrame, orderCols: Seq[Column], k: Int,
      rankCol: String): DataFrame = {
    require(orderCols.nonEmpty, "rankTop needs at least one order column")
    df.orderBy(orderCols: _*).limit(k)
      .coalesce(1).sortWithinPartitions(orderCols: _*)
      .withColumn(rankCol, (monotonically_increasing_id() + 1).cast("long"))
  }

  /** `df` plus a 1-based dense global row number `rankCol`, ordered by
    * `orderCols` — the scale-safe replacement for an unpartitioned
    * `row_number()` window. One range exchange (parallel sort), one
    * N-row count job, zero further shuffles. See object doc.
    */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column],
      rankCol: String = "rank", numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "globalRowNumber needs at least one order column")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .localCheckpoint()
    // Phase 1: per-partition counts. groupBy(pid) is a map-side count
    // plus an N-row shuffle — the only data that ever reaches the
    // driver is one (pid, count) row per partition.
    val counts = sorted
      .groupBy(spark_partition_id().as("_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val numParts = sorted.rdd.getNumPartitions
    // Exclusive prefix sum; range partitions that received no rows are
    // legitimate (sparse key ranges) and contribute 0.
    val offsets = new Array[Long](numParts)
    var acc = 0L
    var p = 0
    while (p < numParts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
      p += 1
    }
    // Phase 2: narrow projection over the checkpointed partitions. The
    // offset table rides along as a map literal (N entries — the same
    // constant-size driver state as the counts).
    val offsetMap = map(offsets.zipWithIndex.flatMap {
      case (off, pid) => Seq(lit(pid), lit(off))
    }.toIndexedSeq: _*)
    val pid = spark_partition_id()
    val localIdx = monotonically_increasing_id() -
      shiftleft(pid.cast("long"), MidCounterBits)
    sorted.select(col("*"),
      (element_at(offsetMap, pid) + localIdx + lit(1L)).as(rankCol))
  }

  /** Rank-fusion ENSEMBLE over per-row quality signals (mean-rank /
    * Borda aggregation — the multi-filter combination step of curation
    * recipes that vote several weak quality signals into one keep
    * order, robust to each signal's scale because only RANKS fuse;
    * same family as d66's RRF but corpus-wide and exact): each signal
    * ranks higher-is-better with ties broken by id (total order), the
    * fused score is the exact mean rank in milli
    * ((Σ ranks)·1000 div k), and `ensemble_rank` re-ranks on it.
    *
    * Scale shape: one checkpointed scan projects all k signals, then
    * k + 1 [[globalRowNumber]] passes (each a parallel range sort —
    * the scale-safe global rank, never an unpartitioned window) and k
    * id-keyed joins of narrow (id, rank) frames. Linear, no pair
    * formation, driver state bounded by partition counts. */
  def rankEnsemble(df: DataFrame, idCol: String,
      signals: Seq[(String, Column)]): DataFrame = {
    require(signals.size >= 2, s"need >= 2 signals, got ${signals.size}")
    require(signals.map(_._1).distinct.size == signals.size,
      "signal names must be distinct")
    // Signal names are spliced into expr() SQL and into `_s_$n` /
    // `rank_$n` column names: a non-identifier name ("a-b", "a b")
    // would silently parse as different SQL (rank_a minus b) or fail
    // at analysis — reject it here where the message can say why.
    signals.map(_._1).foreach { n =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"signal name `$n` must be a bare identifier ([A-Za-z_][A-Za-z0-9_]*) — " +
          "it is spliced into SQL and derived column names")
    }
    val base = df.select(col(idCol) +:
        signals.map { case (n, c) => c.as(s"_s_$n") }: _*)
      .localCheckpoint(true)
    val ranked = signals.map { case (n, _) =>
      globalRowNumber(base.select(col(idCol), col(s"_s_$n")),
          Seq(col(s"_s_$n").desc, col(idCol)), s"rank_$n")
        .select(col(idCol), col(s"rank_$n"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol)))
    val meanExpr = signals.map(s => s"rank_${s._1}")
      .mkString("(", " + ", s") * 1000L div ${signals.size}L")
    globalRowNumber(joined.withColumn("mean_rank_milli", expr(meanExpr)),
      Seq(col("mean_rank_milli"), col(idCol)), "ensemble_rank")
  }

  /** SKEW-RESILIENT running sum: the per-KEY twin of [[globalRowNumber]]
    * for the hot-partition window trap. A running sum
    * `sum(v) OVER (PARTITION BY key ORDER BY seg, ord ROWS UNBOUNDED
    * PRECEDING)` puts every row of a key into ONE window partition —
    * one task sorts and scans the whole slice, so a Zipf head key
    * holding α of the table costs α·n rows in a single task at ANY
    * parallelism (measured: 1.69× at the 10× skew corpus, and the
    * funnel grows linearly with corpus size; uniform keys are fine).
    *
    * The two-level prefix-sum form splits each key's window by a
    * caller-chosen SEGMENT column that must be a leading prefix of the
    * ordering (e.g. the date of a (date, id) order):
    *
    *   1. within-segment running sums — window partitions are
    *      (key, segment), so the hot key's slice splits across its
    *      segments (a 10%-of-corpus key over ~2 400 days → each sorted
    *      partition is 1/2400th of the slice);
    *   2. per-(key, segment) totals, then an EXCLUSIVE running sum over
    *      segments per key — this window is per-key again but sees one
    *      row per segment, not per event;
    *   3. equi-join the segment offsets back on (key, segment) — the
    *      same granularity as step 1, reusing its exchange.
    *
    * Output = step 3 offset + step 1 within-sum, bit-equal to the plain
    * window (spec-asserted, and q101 registers this form against q16's
    * UNSEGMENTED oracle — the gate certifies plan-equivalence). Null
    * values contribute 0 and the output is never null (pinned here;
    * the plain window instead yields NULL until a key's first non-null
    * — segment offsets cannot reproduce that bit, so this operator
    * pins the useful semantics rather than the accidental one). Null
    * KEYS and null SEGMENTS are first-class partition values exactly as
    * the plain window treats them (the offset join is null-safe — a
    * plain equi-join would silently drop those rows).
    *
    * Dial, not default: on uniform keys the plain window is one
    * exchange + one sort while this is two window stages and a join —
    * reach for it when [[SkewJoin.skewReport]] flags the partition key
    * (the q33 salting decision, applied to windows). Determinism needs
    * (segmentCol, orderCols) to totally order rows within a key — the
    * same contract as any running frame. */
  def segmentedRunningSum(df: DataFrame, keyCol: String, segmentCol: String,
      orderCols: Seq[Column], valueCol: Column, outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "segmentedRunningSum needs at least one order column")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col(segmentCol)).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val v = coalesce(valueCol, lit(0L))
    val within = df.withColumn("_run_in_seg", sum(v).over(w1))
    val w2r = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_seg_k")).orderBy(col("_seg_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = df.groupBy(col(keyCol).as("_seg_k"), col(segmentCol).as("_seg_s"))
      .agg(sum(v).as("_seg_sum"))
      .select(col("_seg_k"), col("_seg_s"),
        coalesce(sum(col("_seg_sum")).over(w2r), lit(0L)).as("_seg_off"))
    // NULL-SAFE equi-join: the plain window forms partitions for null
    // keys and sorts null segments first, so the decomposition must
    // carry them too — a plain equi-join (null never equals null) would
    // silently DROP every null-key/null-segment row while the scaladoc
    // promises window-equivalence. <=> keys still plan as a hash join
    // on the same (key, segment) exchange (spec-pinned).
    within.join(offsets,
        col(keyCol) <=> col("_seg_k") && col(segmentCol) <=> col("_seg_s"))
      .withColumn(outCol, col("_seg_off") + col("_run_in_seg"))
      .drop("_run_in_seg", "_seg_off", "_seg_k", "_seg_s")
  }

  /** AUTO-DISPATCHED running sum — the front door over the plain
    * window and [[segmentedRunningSum]], so the caller stops deciding
    * "is my key skewed?" by hand (the g06 components / q102 salted-join
    * precedent: measure, then dispatch; a dial someone must remember to
    * turn is a dial left wrong). The probe is [[SkewJoin.skewReport]]'s
    * top-1 `suggested_salt` = ceil(heaviest key's rows / mean
    * partition's rows) — one hash-agg + count-star, a bounded driver
    * action of the d10-trainCap class. suggested_salt ≤ `threshold`
    * (default 2: heaviest window partition fits within two mean
    * reducers) → the plain one-exchange window; above it → the
    * two-level prefix-sum form, whose extra window stage + join only
    * pay for themselves when a hot key would otherwise funnel one
    * sorted task (plain: 1.69×/1.98× at 10×/100× Zipf; segmented:
    * 0.75× — BASELINE.md skew table).
    *
    * Both branches pin the SAME null-value semantics (null values
    * contribute 0, output never null — the segmented form cannot
    * reproduce the plain window's null-until-first-non-null bit, so
    * the front door pins the useful semantics on both paths); null
    * keys/segments are window-partition values as usual. Dispatch
    * NEVER changes the result (the salting rule) — q109 registers this
    * front door against q16's unsegmented oracle so the gate certifies
    * it. Pass `saltOverride` to skip the probe when the caller already
    * ran the report. */
  def runningSumAuto(df: DataFrame, keyCol: String, segmentCol: String,
      orderCols: Seq[Column], valueCol: Column, outCol: String,
      threshold: Int = 2, saltOverride: Option[Long] = None): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val suggested = saltOverride.getOrElse {
      val parts = df.sparkSession.sessionState.conf.numShufflePartitions
      val top = SkewJoin.skewReport(df, keyCol, topK = 1,
        numPartitions = parts).select(col("suggested_salt")).collect()
      if (top.isEmpty) 1L else top(0).getLong(0)
    }
    if (suggested > threshold) {
      segmentedRunningSum(df, keyCol, segmentCol, orderCols, valueCol, outCol)
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol))
        .orderBy((col(segmentCol).asc +: orderCols): _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      df.withColumn(outCol, sum(coalesce(valueCol, lit(0L))).over(w))
    }
  }
}
