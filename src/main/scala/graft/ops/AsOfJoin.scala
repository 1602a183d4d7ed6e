package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the single latest
  * right row with `right.ts <= left.ts` sharing the same key.
  *
  * The naive formulation — non-equi join then keep max-ts per left row —
  * materializes every (left, right) pair with ts_r <= ts_l, which is
  * quadratic per key and explodes at scale. This implementation instead
  * unions both sides, shuffles ONCE on the key, sorts each partition by
  * (ts, side, tiebreak) and carries the latest right payload forward with
  * a running `last(ignoreNulls)` window — O(n log n) per key group and
  * linear memory, the same merge-scan shape a native time-series engine
  * uses. Equal timestamps resolve right-before-left, i.e. inclusive
  * (`>=`) semantics, matching DuckDB's ASOF JOIN.
  *
  * @param tiebreak right-side column ordering the carry-forward when two
  *                 right rows share (key, ts) — makes the pick
  *                 deterministic instead of partition-order-dependent.
  */
object AsOfJoin {
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Map[String, String],
      tiebreak: String): DataFrame =
    join(left, right, key, ts, rightPayload, tiebreak, forwardDir = false)

  /** As-of FORWARD join: for each left row, the single EARLIEST right
    * row with `right.ts >= left.ts` sharing the key — the "next event
    * after" direction (next restock after an order, next heartbeat
    * after a failure). Same one-shuffle union-scan as [[backward]],
    * with the partition scan running in DESCENDING ts order so the
    * carried-forward payload is the nearest following right row; equal
    * timestamps still resolve right-matches-left (inclusive `>=`),
    * mirroring DuckDB's `ASOF JOIN ... ON l.ts <= r.ts`. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Map[String, String],
      tiebreak: String): DataFrame =
    join(left, right, key, ts, rightPayload, tiebreak, forwardDir = true)

  private def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Map[String, String],
      tiebreak: String,
      forwardDir: Boolean): DataFrame = {

    val payloadStruct = struct(
      rightPayload.toSeq.sortBy(_._1).map { case (src, dst) => col(src).as(dst) }: _*)
    // SQL equality-join semantics: a null key (or null ts) on the right
    // matches nothing — without this filter Window.partitionBy would
    // group null keys into one partition and "match" them. The tiebreak
    // keeps its original type (any orderable column works; a long cast
    // would throw under ANSI for strings).
    val rightSide = right
      .where(col(key).isNotNull && col(ts).isNotNull)
      .select(
        col(key).as("_k"), col(ts).as("_ts"), lit(0).as("_side"),
        col(tiebreak).as("_tie"), payloadStruct.as("_payload"))
    val payloadType = rightSide.schema("_payload").dataType
    val tieType = rightSide.schema("_tie").dataType

    // left rows sort after right rows at equal (k, ts) via _side alone,
    // so their _tie is irrelevant — null keeps the column type-compatible
    val leftSide = left.select(
      col(key).as("_k"), col(ts).as("_ts"), lit(1).as("_side"),
      lit(null).cast(tieType).as("_tie"), lit(null).cast(payloadType).as("_payload"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_row"))

    val unioned = rightSide
      .withColumn("_row", lit(null).cast(leftSide.schema("_row").dataType))
      .unionByName(leftSide)

    // side=0 (right) sorts before side=1 (left) at equal ts => inclusive
    // in BOTH directions (the _side tiebreak is direction-independent).
    // Forward scans ts descending, so "last right seen" is the nearest
    // FOLLOWING right row instead of the nearest preceding one.
    // desc_nulls_first is load-bearing: a left row with NULL ts must
    // match nothing (SQL comparison-with-NULL semantics, same as DuckDB
    // ASOF). asc puts nulls first already; desc defaults to NULLS LAST,
    // which would hand null-ts left rows the key's earliest right row.
    val tsOrder = if (forwardDir) col("_ts").desc_nulls_first else col("_ts").asc
    val w = Window.partitionBy("_k")
      .orderBy(tsOrder, col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_row.*") +: rightPayload.values.toSeq.sorted
        .map(d => col(s"_match.$d").as(d)): _*)
  }

  /** As-of NEAREST join — completes the direction family (backward
    * q27 / forward q67): for each left row, whichever of the latest
    * preceding and earliest following right row is CLOSER in time,
    * ties preferring backward (the pandas merge_asof
    * direction='nearest' shape, with the tie pinned rather than
    * implementation-defined). `leftId` must uniquely identify left
    * rows — the two directional passes are stitched back on it.
    *
    * Scale shape: one [[backward]] pass + one [[forward]] pass (each
    * the one-shuffle union merge-scan, both keyed on `key`) + one
    * leftId-keyed equi-join of two left-sized frames. No pair
    * formation anywhere — the nearest pick is a per-row CASE over the
    * two candidates' exact micro distances.
    *
    * Contract (guarded): `rightPayload` must not map the `ts` column —
    * the matched timestamp is already returned as `matched_ts`, and the
    * internal stitch reserves the ts key for its own `__b_ts`/`__f_ts`
    * plumbing (a caller entry would be silently overwritten).
    * `leftId` uniqueness is the caller's obligation: a duplicate id
    * fans rows out through the backward-join-forward stitch (checked
    * per-row would cost a full agg; callers with synthetic ids get it
    * by construction, others should dedupe first). */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Map[String, String],
      tiebreak: String,
      leftId: String): DataFrame = {
    require(!rightPayload.contains(ts),
      s"rightPayload must not map the ts column `$ts` — the matched right " +
        "timestamp is returned as `matched_ts`; map a renamed copy if the " +
        "raw column is also needed")
    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val tsType = left.schema(ts).dataType
    val bPay = rightPayload.map { case (s, d) => (s, s"${d}__b") } +
      (ts -> "__b_ts")
    val fPay = rightPayload.map { case (s, d) => (s, s"${d}__f") } +
      (ts -> "__f_ts")
    val b = backward(left, right, key, ts, bPay, tiebreak)
    val f = forward(left.select(col(leftId), col(key), col(ts)),
        right, key, ts, fPay, tiebreak)
      .select(col(leftId) +: fPay.values.toSeq.sorted.map(col): _*)
    val dB = micros(col(ts), tsType) - micros(col("__b_ts"), tsType)
    val dF = micros(col("__f_ts"), tsType) - micros(col(ts), tsType)
    val useB = col("__f_ts").isNull ||
      (col("__b_ts").isNotNull && dB <= dF)
    b.join(f, Seq(leftId))
      .select(left.columns.toIndexedSeq.map(col) ++
        rightPayload.values.toSeq.sorted.map(d =>
          when(useB, col(s"${d}__b")).otherwise(col(s"${d}__f")).as(d)) :+
        when(useB, col("__b_ts")).otherwise(col("__f_ts")).as("matched_ts"): _*)
  }

  /** Column-level helper for callers composing their own plans. */
  def inclusiveBefore(leftTs: Column, rightTs: Column): Column = leftTs >= rightTs
}
