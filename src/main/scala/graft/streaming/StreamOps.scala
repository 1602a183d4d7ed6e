package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is pure batch (SURVEY
  * §2.7) — its closest analogue is the page-resume ledger, which IS the
  * file-source checkpoint pattern — but the rebuilt engine exposes the
  * streaming forms of its aggregations as first-class operators. Every
  * transform here works identically on a batch DataFrame (Spark's
  * unified API), which is how the batch oracle queries q28/q29 validate
  * the same plans the stream runs.
  *
  * Scale notes: state stores are per-key; watermarks bound state size
  * (no watermark = unbounded state = eventual OOM at 100 TB/day). Keys
  * are hash-partitioned across executors — the same salting rules apply
  * to skewed keys as in batch.
  */
object StreamOps {

  /** Tumbling-window counts+sums with a watermark bounding late data. */
  def tumblingAgg(events: DataFrame, tsCol: String, watermark: String,
      windowDur: String, keyCol: String, valueCol: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col(keyCol), col("n"), col("total"))

  /** Sliding-window variant (windowDuration, slideDuration). */
  def slidingAgg(events: DataFrame, tsCol: String, watermark: String,
      windowDur: String, slide: String, keyCol: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Session windows with a fixed inactivity gap. */
  def sessionAgg(events: DataFrame, tsCol: String, watermark: String,
      gap: String, keyCol: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Streaming dedup: exactly-once per key within the watermark horizon
    * (the streaming form of Dedup.exact — state = one entry per key,
    * expired by the watermark). */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  // --- custom state: running per-key aggregate via flatMapGroupsWithState ---

  final case class KeyedEvent(user_id: Long, value: Double)
  final case class RunningTotal(user_id: Long, n: Long, total: Double)

  /** Custom stateful op: emits the updated running (count, sum) per key
    * on every batch — the mapGroupsWithState pattern the reference's
    * "recompute everything" silver stage would become on a stream.
    * State for keys idle longer than `idleTimeout` is dropped (this
    * file's own rule: unbounded key cardinality with untimed state is
    * an eventual OOM — the one custom-state operator must follow it). */
  def runningTotals(spark: SparkSession, events: Dataset[KeyedEvent],
      idleTimeout: Option[String] = Some("1 hour")): Dataset[RunningTotal] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunningTotal, RunningTotal](
        OutputMode.Append, timeoutConf) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[RunningTotal]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(RunningTotal(key, 0L, 0.0))
            var n = prior.n
            var total = prior.total
            rows.foreach { e => n += 1; total += e.value }
            val updated = RunningTotal(key, n, total)
            state.update(updated)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator(updated)
          }
      }
  }

  final case class TypedEvent(event_id: Long, user_id: Long,
      event_type: String, ts_us: Long)
  final case class DebounceVerdict(event_id: Long, user_id: Long,
      event_type: String, gap_us: Long, kept: Boolean)

  /** Streaming twin of EventAnalytics.debounce: per-(user, type)
    * adjacent-gap repeat suppression with the last-seen timestamp as the
    * only state (one long per live key; idle keys expire). Within a
    * micro-batch, rows are walked in ts order (then id), so a single
    * ordered replay emits exactly the batch verdicts — asserted
    * stream==batch in StreamOpsSpec. Caveat shared with every
    * non-watermarked stateful op: ACROSS micro-batches the walk follows
    * arrival order; out-of-order arrivals need a watermark + reorder
    * stage upstream.
    *
    * `idleTimeout` is a ProcessingTimeTimeout — WALL-CLOCK time, while
    * `windowSeconds` is EVENT time, so no timeout value can strictly
    * bound an event-time gap: a key whose arrivals lag far behind event
    * time can expire between two events that are within the window, and
    * the repeat is then reported kept (gap −1) where batch suppresses
    * it. Batch-equivalent verdicts therefore require BOTH an idle
    * timeout that exceeds the window AND arrival keeping pace with
    * event time (the near-real-time case the operator targets). The
    * no-timeout-argument overload derives the timeout from the window
    * (2×, floor 1 h) — that removes the obvious misconfiguration
    * (timeout ≪ window), not the time-domain caveat; pass None for no
    * expiry at all when key cardinality is bounded and strict
    * equivalence matters more than state size. */
  def debounceStream(spark: SparkSession, events: Dataset[TypedEvent],
      windowSeconds: Long): Dataset[DebounceVerdict] =
    debounceStream(spark, events, windowSeconds,
      Some(s"${math.max(2 * windowSeconds, 3600L)} seconds"))

  /** See the derived-timeout overload above for the idleTimeout contract. */
  def debounceStream(spark: SparkSession, events: Dataset[TypedEvent],
      windowSeconds: Long,
      idleTimeout: Option[String]): Dataset[DebounceVerdict] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, DebounceVerdict](
        OutputMode.Append, timeoutConf) {
        (key: (Long, String), rows: Iterator[TypedEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var prev = state.getOption.getOrElse(Long.MinValue)
            val out = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
              val gap = if (prev == Long.MinValue) -1L else e.ts_us - prev
              prev = e.ts_us
              DebounceVerdict(e.event_id, key._1, key._2, gap,
                gap == -1L || gap >= windowSeconds * 1000000L)
            }
            state.update(prev)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  final case class FunnelState(stage: Int, lastTs: Long, deadline: Long)
  final case class FunnelProgress(user_id: Long, stage: Long, step: String,
      ts_us: Long)

  /** Streaming twin of EventAnalytics.funnel: a per-user state machine —
    * state is (highest stage reached, its event time, the funnel
    * deadline), three numbers per live user. An event advances the
    * machine when it matches the NEXT step at-or-after the current stage
    * time and inside the deadline; each advancement emits a
    * FunnelProgress row, so counting distinct users per stage downstream
    * reproduces the batch stage counts (asserted stream==batch in
    * StreamOpsSpec — the ordered greedy walk takes the first qualifying
    * event, which IS the batch min). Same ordering caveat as
    * [[debounceStream]]: within a micro-batch rows are walked in
    * (ts, id) order; cross-batch reordering needs an upstream
    * watermark+sort stage. Timeout contract also as in
    * [[debounceStream]], including the time-domain caveat (the timeout
    * is wall-clock, the horizon event-time): state expiring inside the
    * conversion horizon lets a user re-enter the funnel with a fresh
    * deadline, so the no-timeout-argument overload derives idleTimeout
    * from the horizon (2×, floor 1 h); None disables expiry
    * entirely. */
  def funnelStream(spark: SparkSession, events: Dataset[TypedEvent],
      steps: Seq[String], horizonHours: Int): Dataset[FunnelProgress] =
    funnelStream(spark, events, steps, horizonHours,
      Some(s"${math.max(2L * horizonHours * 3600L, 3600L)} seconds"))

  /** See the derived-timeout overload above for the idleTimeout contract. */
  def funnelStream(spark: SparkSession, events: Dataset[TypedEvent],
      steps: Seq[String], horizonHours: Int,
      idleTimeout: Option[String]): Dataset[FunnelProgress] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    import spark.implicits._
    val horizonUs = horizonHours * 3600L * 1000000L
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.orNull
            val out = Seq.newBuilder[FunnelProgress]
            rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              if (st == null) {
                if (e.event_type == steps.head) {
                  st = FunnelState(0, e.ts_us, e.ts_us + horizonUs)
                  out += FunnelProgress(user, 0L, steps.head, e.ts_us)
                }
              } else if (st.stage < steps.size - 1 &&
                  e.event_type == steps(st.stage + 1) &&
                  e.ts_us >= st.lastTs && e.ts_us <= st.deadline) {
                st = FunnelState(st.stage + 1, e.ts_us, st.deadline)
                out += FunnelProgress(user, st.stage.toLong, e.event_type, e.ts_us)
              }
            }
            if (st != null) state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  // --- event-time twins of the walk operators (debounce, funnel) ---

  final case class StampedEvent(event_id: Long, user_id: Long,
      event_type: String, ts_us: Long, ts: java.sql.Timestamp)
  final case class DebounceEtState(lastTs: Long, releasedUs: Long,
      pending: Seq[TypedEvent])
  final case class FunnelEtState(stage: Int, stageTs: Long, deadline: Long,
      started: Boolean, releasedUs: Long, pending: Seq[TypedEvent])

  /** The ONE pending-release law shared by the event-time walk twins
    * ([[debounceStreamEventTime]], [[funnelStreamEventTime]]), so the
    * two forms cannot drift. Unlike the day-bucketed monitors (order-
    * free, day-scoped aggregates), debounce and funnel are ORDER-
    * SENSITIVE walks over a continuous series — suppression windows
    * and conversion deadlines cross day boundaries — so their event-
    * time form releases individual events in watermark order instead
    * of day buckets: admitted events buffer in state, and once the
    * watermark strictly passes an event's time (no admissible arrival
    * can precede it any more) it is released through the exact batch
    * machine in (ts, id) order. Returns (ripe-sorted, still-pending).
    * An event at EXACTLY the watermark holds — an equal-ts tie could
    * still arrive and tie-break by id. */
  private def splitRipe(prior: Seq[TypedEvent], arrivals: Seq[TypedEvent],
      wmUs: Long): (Seq[TypedEvent], Seq[TypedEvent]) = {
    val (ripe, hold) = (prior ++ arrivals).partition(_.ts_us < wmUs)
    (ripe.sortBy(e => (e.ts_us, e.event_id)), hold)
  }

  /** Arm the event-time wake for the earliest pending event: it ripens
    * when the watermark strictly passes its time. Pending events sit
    * at-or-after the current watermark by construction, but the +1
    * clamps survive the armDaySeal boundary case (an event at exactly
    * the watermark after integer ms truncation). */
  private def armEventWake(state: GroupState[_], minPendingUs: Long): Unit =
    state.setTimeoutTimestamp(math.max(minPendingUs / 1000L + 1L,
      state.getCurrentWatermarkMs() + 1L))

  private def stampEvents(spark: SparkSession, events: Dataset[TypedEvent],
      lateness: String): Dataset[StampedEvent] = {
    import spark.implicits._
    events
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .as[StampedEvent]
      .withWatermark("ts", lateness)
  }

  /** EVENT-TIME twin of [[debounceStream]]: verdicts are computed over
    * the series in EVENT order regardless of arrival order — under
    * backfill or ingestion skew the arrival-time form's suppression
    * windows smear (a late repeat can be judged against the wrong
    * predecessor); this form buffers events until the watermark passes
    * them and walks the released prefix through the identical gap
    * arithmetic, so the emitted verdicts after any batch split
    * bit-equal the batch debounce over every admitted row
    * (spec-asserted, late arrivals included). State per (user, type):
    * the last released event time plus the pending buffer — bounded by
    * the lateness horizon, NOT by history. Sealed-prefix guard (the
    * zscoreStreamByDay contract transposed from days to the released
    * prefix): an over-late event whose time the release watermark has
    * already passed would have to be inserted BEHIND verdicts already
    * emitted — it is dropped, never re-walked. The one-long lastTs
    * survives per key with no expiry (the ewmaStreamByDay retention
    * rule: bounded-cardinality keys, or recreate the query
    * periodically). */
  def debounceStreamEventTime(spark: SparkSession, events: Dataset[TypedEvent],
      windowSeconds: Long, lateness: String): Dataset[DebounceVerdict] = {
    import spark.implicits._
    val winUs = windowSeconds * 1000000L
    stampEvents(spark, events, lateness)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebounceEtState, DebounceVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[StampedEvent],
            state: GroupState[DebounceEtState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prior = state.getOption
            .getOrElse(DebounceEtState(Long.MinValue, Long.MinValue, Nil))
          val arrivals =
            rows.filter(_.ts_us >= prior.releasedUs) // sealed prefix
              .map(e => TypedEvent(e.event_id, e.user_id, e.event_type, e.ts_us))
              .toList
          val (ripe, hold) = splitRipe(prior.pending, arrivals, wmUs)
          var prev = prior.lastTs
          val out = ripe.map { e =>
            val gap = if (prev == Long.MinValue) -1L else e.ts_us - prev
            prev = e.ts_us
            DebounceVerdict(e.event_id, key._1, key._2, gap,
              gap == -1L || gap >= winUs)
          }
          state.update(DebounceEtState(prev,
            math.max(prior.releasedUs, wmUs), hold))
          if (hold.nonEmpty) armEventWake(state, hold.map(_.ts_us).min)
          out.iterator
      }
  }

  /** EVENT-TIME twin of [[funnelStream]]: the per-user stage machine
    * advances in EVENT order via the shared [[splitRipe]] release law
    * (see [[debounceStreamEventTime]] — same buffering, same sealed-
    * prefix guard, same retention rule; conversion deadlines are
    * event-time facts, so arrival skew cannot stretch or shrink a
    * funnel's horizon here). Emitted FunnelProgress rows after any
    * batch split bit-equal the batch funnel over every admitted row
    * (spec-asserted). State per user: the machine (three longs + a
    * flag) plus the horizon-bounded pending buffer. */
  def funnelStreamEventTime(spark: SparkSession, events: Dataset[TypedEvent],
      steps: Seq[String], horizonHours: Int,
      lateness: String): Dataset[FunnelProgress] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    import spark.implicits._
    val horizonUs = horizonHours * 3600L * 1000000L
    stampEvents(spark, events, lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelEtState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StampedEvent],
            state: GroupState[FunnelEtState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prior = state.getOption.getOrElse(
            FunnelEtState(0, 0L, 0L, started = false, Long.MinValue, Nil))
          val arrivals =
            rows.filter(_.ts_us >= prior.releasedUs) // sealed prefix
              .map(e => TypedEvent(e.event_id, e.user_id, e.event_type, e.ts_us))
              .toList
          val (ripe, hold) = splitRipe(prior.pending, arrivals, wmUs)
          var st = prior
          val out = Seq.newBuilder[FunnelProgress]
          ripe.foreach { e =>
            if (!st.started) {
              if (e.event_type == steps.head) {
                st = st.copy(stage = 0, stageTs = e.ts_us,
                  deadline = e.ts_us + horizonUs, started = true)
                out += FunnelProgress(user, 0L, steps.head, e.ts_us)
              }
            } else if (st.stage < steps.size - 1 &&
                e.event_type == steps(st.stage + 1) &&
                e.ts_us >= st.stageTs && e.ts_us <= st.deadline) {
              st = st.copy(stage = st.stage + 1, stageTs = e.ts_us)
              out += FunnelProgress(user, st.stage.toLong, e.event_type, e.ts_us)
            }
          }
          state.update(st.copy(releasedUs = math.max(prior.releasedUs, wmUs),
            pending = hold))
          if (hold.nonEmpty) armEventWake(state, hold.map(_.ts_us).min)
          out.result().iterator
      }
  }

  /** Stream-stream inner join with bounded state: both sides are
    * watermarked and the join condition carries a time range, so the
    * state store holds only rows inside the watermark horizon (an
    * unconstrained stream-stream join would buffer both streams
    * forever). Classic enrichment shape: match right-side events to
    * left-side events of the same key within `within` AFTER the left
    * event's timestamp. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
  }

  /** Stream-static enrichment join: a streaming fact against a batch
    * dimension. Stateless on the stream side (no watermark needed — each
    * micro-batch joins the dim as-of execution), and the dim should be
    * broadcast-sized: Spark re-plans the join per micro-batch, so a
    * broadcast dim keeps every batch shuffle-free on the stream side —
    * the streaming twin of the q10 broadcast-dim plan. */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String,
      joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), joinType)

  // --- streaming approximate distinct: incremental HLL register state ---

  final case class KeyedItem(group: String, item: String)
  final case class HllState(n: Long, regs: Array[Byte])
  final case class HllGroupEstimate(group: String, n_items: Long, hll_est: Double)

  /** The ONE HLL register fold, shared by the arrival-time and
    * event-time stream forms (the cmCells rule): identical arithmetic
    * to the batch hllRegisters — hp = low 52 bits of the first
    * little-endian md5 half, register = low p bits, rho = (53−p) minus
    * the bit length of the remaining bits — so the stream estimates
    * stay bit-identical to the Catalyst sketch. */
  private def hllFoldItem(regs: Array[Byte], item: String, p: Int): Unit = {
    val m = 1 << p
    val rhoMax = 53 - p
    val hp = graft.functions.Md5Mix.halves(
      org.apache.spark.unsafe.types.UTF8String.fromString(item))(0) &
      ((1L << 52) - 1)
    val reg = (hp & (m - 1)).toInt
    val w = hp >>> p
    val rho =
      if (w == 0L) rhoMax
      else rhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(reg)) regs(reg) = rho.toByte
  }

  /** Streaming per-group approximate distinct — the incremental form of
    * ops/Sketches.hllRegisters: each group keeps a DENSE m-byte register
    * array in state (constant size regardless of stream length — the
    * reason sketches exist) and folds every arriving item's
    * (register, rho) in with max(). Because the fold IS the register
    * merge law (max is associative/commutative/idempotent), the
    * estimate emitted after ANY prefix of batches is bit-identical to
    * the batch [[graft.ops.Sketches.hllDistinct]] over the same rows —
    * asserted in StreamOpsSpec, which is what pins this JVM-side
    * replication of the hash/estimate arithmetic to the Catalyst one.
    * Emits the updated (group, n_items, estimate) each batch; idle
    * groups drop state after `idleTimeout` (this file's unbounded-keys
    * rule). */
  def hllDistinctStream(spark: SparkSession, items: Dataset[KeyedItem],
      p: Int = 9,
      idleTimeout: Option[String] = Some("1 hour")): Dataset[HllGroupEstimate] = {
    import spark.implicits._
    val m = 1 << p
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    items.groupByKey(_.group)
      .flatMapGroupsWithState[HllState, HllGroupEstimate](
        OutputMode.Append, timeoutConf) {
        (group: String, rows: Iterator[KeyedItem], state: GroupState[HllState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(HllState(0L, new Array[Byte](m)))
            val regs = prior.regs.clone()
            var n = prior.n
            val n0 = n
            // null items are not values — the batch hllRegisters filter,
            // replicated (they would NPE the hash and skew n_items)
            rows.filter(_.item != null).foreach { it =>
              hllFoldItem(regs, it.item, p)
              n += 1
            }
            // a batch of only-null items must not allocate an m-byte
            // register array for a NEW group (junk-group firehose
            // hazard) and emits nothing — but a group that already
            // holds state must have its idle timeout RE-armed: Spark
            // clears the registered timeout on every invocation of this
            // function, so skipping the re-set would cancel expiry and
            // pin the existing registers forever (the exact failure the
            // guard exists to prevent)
            if (n == n0) {
              if (state.exists) idleTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            } else {
              state.update(HllState(n, regs))
              idleTimeout.foreach(state.setTimeoutDuration)
              Iterator(HllGroupEstimate(group, n, estimateFromRegs(regs, p)))
            }
          }
      }
  }

  final case class BloomState(words: Array[Long])
  final case class DedupVerdict(group: String, item: String, kept: Boolean)

  /** Streaming dedup with CONSTANT state — the approximate counterpart
    * of [[dedupStream]], whose exact state grows with distinct keys
    * (watermark-bounded, but a key universe that never repeats within
    * the watermark still accumulates until expiry). Here each group
    * keeps a fixed numBits-bit Bloom bitmap: an arriving item is kept
    * iff not all of its k positions are set, then its positions are
    * set. One-sided like the batch filter: a kept row is GENUINELY
    * first-seen within the group (no false drops of duplicates —
    * duplicates always hit their own bits); a novel row can be
    * spuriously dropped at the filter's false-positive rate as the
    * bitmap fills — the knob is numBits, state is numBits/8 bytes per
    * group forever. Hash positions replicate
    * ops/Sketches.bloomBits' Kirsch–Mitzenmacher construction (same
    * md5 halves), so a batch-built filter and the stream agree on
    * membership bit for bit. */
  def bloomDedupStream(spark: SparkSession, items: Dataset[KeyedItem],
      numHashes: Int = 4, numBits: Int = 1 << 16,
      idleTimeout: Option[String] = Some("1 hour")): Dataset[DedupVerdict] = {
    import spark.implicits._
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes must be in [1,8], got $numHashes")
    require(numBits >= 64 && numBits <= (1 << 22) && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two in [64, 2^22], got $numBits")
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    items.groupByKey(_.group)
      .flatMapGroupsWithState[BloomState, DedupVerdict](
        OutputMode.Append, timeoutConf) {
        (group: String, rows: Iterator[KeyedItem], state: GroupState[BloomState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption
              .getOrElse(BloomState(new Array[Long](numBits / 64)))
            val words = prior.words.clone()
            val mask26 = (1L << 26) - 1
            val out = rows.filter(_.item != null).map { it =>
              // Sketches.kmHalves / cmCell, replicated: position_r =
              // (a + r·b) & (numBits−1) from one md5 per item
              val h = graft.functions.Md5Mix.halves(
                org.apache.spark.unsafe.types.UTF8String.fromString(it.item))(0)
              val a = h & mask26
              val b = (h >>> 26) & mask26
              var r = 0
              var allSet = true
              while (r < numHashes) {
                val pos = (a + r * b) & (numBits - 1)
                val w = (pos >> 6).toInt
                val bit = 1L << (pos & 63)
                if ((words(w) & bit) == 0L) { allSet = false; words(w) |= bit }
                r += 1
              }
              DedupVerdict(group, it.item, kept = !allSet)
            }.toVector
            // a batch of only-null items is NOT activity: writing state
            // for it would allocate a permanent numBits/8-byte bitmap
            // per junk group (this file's unbounded-keys rule). But a
            // group that ALREADY holds state must have its idle timeout
            // re-armed — Spark clears the registered timeout on every
            // invocation, so skipping the re-set would cancel expiry
            // and pin the bitmap forever
            if (out.nonEmpty) {
              state.update(BloomState(words))
              idleTimeout.foreach(state.setTimeoutDuration)
            } else if (state.exists) {
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }
  }

  final case class CmState(n: Long, counters: Array[Long])
  final case class CmKeyEstimate(group: String, item: String,
      n_items: Long, est_n: Long)

  /** Streaming count-min: live per-group heavy-hitter frequency
    * tracking with CONSTANT state — the streaming twin of the batch
    * q62/q72 sketches (ops/Sketches.countMinCounters), folding each
    * arriving item into a fixed depth×width counter table per group
    * (depth·width·8 bytes forever, 32 KB at the defaults, regardless of
    * key cardinality). After folding a batch it emits the CURRENT
    * estimate for each distinct item seen in that batch — one-sided
    * (est ≥ true count, collisions only inflate), exactly the batch
    * guarantee running live.
    *
    * Cell positions replicate Sketches' Kirsch–Mitzenmacher
    * construction from the same md5 halves (a + r·b over the first
    * little-endian half), so after any batch prefix the stream's
    * estimate for a key equals ops/Sketches.countMinEstimate probed
    * against a batch sketch of the same rows, bit for bit — the
    * merge-law bridge between the live and offline forms, asserted in
    * StreamOpsSpec. Null items and null-only batches follow the
    * file-wide unbounded-keys rule: no fold, no state allocation, no
    * timeout refresh, no emission. */
  def countMinStream(spark: SparkSession, items: Dataset[KeyedItem],
      depth: Int = 4, width: Int = 1024,
      idleTimeout: Option[String] = Some("1 hour")): Dataset[CmKeyEstimate] = {
    import spark.implicits._
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2 && width <= (1 << 26) && (width & (width - 1)) == 0,
      s"width must be a power of two in [2, 2^26], got $width")
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    items.groupByKey(_.group)
      .flatMapGroupsWithState[CmState, CmKeyEstimate](
        OutputMode.Append, timeoutConf) {
        (group: String, rows: Iterator[KeyedItem], state: GroupState[CmState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption
              .getOrElse(CmState(0L, new Array[Long](depth * width)))
            val counters = prior.counters.clone()
            var n = prior.n
            def cells(item: String): Array[Int] = cmCells(item, depth, width)
            // distinct batch items in arrival order → deterministic
            // emission order; estimates are computed AFTER the whole
            // batch folds, so every emission reflects the full prefix
            val seen = new scala.collection.mutable.LinkedHashSet[String]
            rows.filter(_.item != null).foreach { it =>
              cells(it.item).foreach(counters(_) += 1)
              n += 1
              seen += it.item
            }
            if (seen.isEmpty) {
              // no new-group allocation for junk traffic, but an
              // EXISTING group's idle timeout must be re-armed — Spark
              // clears the registered timeout on every invocation, so
              // skipping the re-set would pin the counters forever
              if (state.exists) idleTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            } else {
              state.update(CmState(n, counters))
              idleTimeout.foreach(state.setTimeoutDuration)
              seen.iterator.map { item =>
                CmKeyEstimate(group, item, n, cells(item).map(counters).min)
              }
            }
          }
      }
  }

  /** The ONE count-min cell derivation, shared by every CMS form here
    * (arrival-time fold, probe, and the event-time day variant) — a
    * drifted copy would silently break the batch bit-compat law. Same
    * math as Sketches.kmHalves / cmCell, flattened to counter indices. */
  private def cmCells(item: String, depth: Int, width: Int): Array[Int] = {
    val mask26 = (1L << 26) - 1
    val h = graft.functions.Md5Mix.halves(
      org.apache.spark.unsafe.types.UTF8String.fromString(item))(0)
    val a = h & mask26
    val b = (h >>> 26) & mask26
    Array.tabulate(depth)(r =>
      r * width + ((a + r * b) & (width - 1)).toInt)
  }

  final case class ZscoreState(n: Long, s: Long, ss: Long)
  final case class ZscoreBatch(group: String, n: Long, sum: Long,
      sumsq: Long, n_anomalies: Long)

  /** Streaming σ-anomaly monitor — the live twin of
    * EventAnalytics.anomalousDays, same exact integer inequality
    * (v·n − s)² > k²·(n·ss − s²), with (n, s, ss) the running moments
    * of the group's WHOLE prefix (state law: after any batch prefix
    * the moments bit-equal the batch aggregate over the same rows —
    * asserted in spec). Values fold first, then every value of the
    * incoming batch is tested against the post-fold moments, exactly
    * how the batch op scores a day against statistics that include it.
    * Constant state: three longs per group, ever. Emits one summary
    * row per (group, batch): the moments plus how many of the batch's
    * values broke k·σ. Overflow bound: Σv² < 2⁶³ per group (the
    * anomalousDays bucket rule — pre-scale coarse values).
    *
    * Guards (the countMinStream/hllDistinctStream contract): a
    * null-only batch allocates no state for a new group and emits
    * nothing, but RE-arms an existing group's idle timeout — Spark
    * clears the registered timeout on every invocation, so an early
    * return that skips the re-set would pin the moments forever. */
  def zscoreStream(spark: SparkSession, values: Dataset[KeyedValue],
      sigmas: Int = 2,
      idleTimeout: Option[String] = Some("1 hour")): Dataset[ZscoreBatch] = {
    import spark.implicits._
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val k2 = sigmas.toLong * sigmas
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    values.groupByKey(_.group)
      .flatMapGroupsWithState[ZscoreState, ZscoreBatch](
        OutputMode.Append, timeoutConf) {
        (group: String, rows: Iterator[KeyedValue], state: GroupState[ZscoreState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(ZscoreState(0L, 0L, 0L))
            val batch = rows.filter(_.value != null).map(_.value.longValue()).toArray
            if (batch.isEmpty) {
              if (state.exists) idleTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            } else {
              var n = prior.n; var s = prior.s; var ss = prior.ss
              batch.foreach { v => n += 1; s += v; ss += v * v }
              val rhs = k2 * (n * ss - s * s)
              val flagged = batch.count { v =>
                val dev = v * n - s
                dev * dev > rhs
              }
              state.update(ZscoreState(n, s, ss))
              idleTimeout.foreach(state.setTimeoutDuration)
              Iterator(ZscoreBatch(group, n, s, ss, flagged.toLong))
            }
          }
      }
  }
  final case class KeyedValue(group: String, value: java.lang.Long)

  final case class EwmaState(t: Long, recent: Array[Long])
  final case class EwmaPoint(group: String, t: Long, value: Long, ewma: Long)

  /** Streaming exact EWMA (α = 1/2, window 16) — the live twin of
    * EventAnalytics.ewmaSmooth: same power-of-two weight ladder, same
    * arithmetic >> 16 floor, so feeding a key's series through any
    * batch split yields BIT-IDENTICAL smoothed points to the batch
    * window over the completed series (spec-asserted). Values smooth in
    * ARRIVAL order within each batch (the op's order contract — q88's
    * batch twin orders by day; feed the stream the same order).
    * Constant state: at most 16 longs per group (the trailing window),
    * with the null-batch / timeout-re-arm guards of the sketch
    * streams. */
  def ewmaStream(spark: SparkSession, values: Dataset[KeyedValue],
      idleTimeout: Option[String] = Some("1 hour")): Dataset[EwmaPoint] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    values.groupByKey(_.group)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, timeoutConf) {
        (group: String, rows: Iterator[KeyedValue], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(EwmaState(0L, Array.empty[Long]))
            val batch = rows.filter(_.value != null).map(_.value.longValue()).toArray
            if (batch.isEmpty) {
              if (state.exists) idleTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            } else {
              // recent(0) is the newest value; identical ladder to the
              // batch op's lag(value, j) * 2^(15-j) — here j indexes
              // recency directly
              var recent = prior.recent
              var t = prior.t
              val out = batch.map { v =>
                recent = (v +: recent).take(16)
                var acc = 0L
                var j = 0
                while (j < recent.length) {
                  acc += recent(j) * (1L << (15 - j)); j += 1
                }
                t += 1
                EwmaPoint(group, t, v, acc >> 16)
              }
              state.update(EwmaState(t, recent))
              idleTimeout.foreach(state.setTimeoutDuration)
              out.iterator
            }
          }
      }
  }

  final case class TimedValue(group: String, ts: java.sql.Timestamp,
      value: java.lang.Long)
  final case class ZscoreDayBatch(group: String, day: String, n: Long,
      sum: Long, sumsq: Long, n_anomalies: Long)

  private def utcDayIdx(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 86400000L)
  private def utcDayString(dayIdx: Long): String =
    java.time.LocalDate.ofEpochDay(dayIdx).toString

  /** Re-arm a (group, day) seal. The day's end is the natural seal
    * time, but the clamp is load-bearing: flatMapGroupsWithState
    * admits late rows against the PREVIOUS batch's watermark while
    * setTimeoutTimestamp validates against the CURRENT one. A late
    * row for a still-open day, arriving in the very batch where the
    * watermark jumps past that day's end (the backfill scenario these
    * operators exist for), passes the filter and folds — then a bare
    * setTimeoutTimestamp(dayEndMs) throws IllegalArgumentException
    * and kills the query, deterministically again on restart. Clamped
    * just past the current watermark, the seal instead fires on the
    * next watermark advance. */
  private[streaming] def armDaySeal(state: GroupState[_], dayEndMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(dayEndMs, state.getCurrentWatermarkMs() + 1L))

  /** EVENT-TIME twin of [[zscoreStream]]: moments keyed on
    * (group, event-time UTC day) with a watermark, so a late event
    * folds into the day it HAPPENED in — not the day it arrived in,
    * which is what the processing-time form would charge at real
    * ingestion skew. State: three longs per (group, open day), sealed
    * by an event-time timeout once the watermark passes the day's end
    * (bounded by groups × days inside the lateness horizon, not by
    * history). Emits the day's post-fold moments each batch the day
    * receives data — the monotone n is the marker for selecting a
    * day's current moments from an Append sink (the ZscoreBatch
    * convention), and the final emission for a day bit-equals the
    * batch aggregate over every row the watermark admitted
    * (spec-asserted, late arrivals included).
    *
    * Sealed-day guard: flatMapGroupsWithState does NOT pre-filter
    * late input the way windowed aggregations do — an over-late event
    * (day end already behind the watermark) arriving after the
    * timeout removed the day's state would otherwise seed FRESH
    * moments for a sealed day and emit nonsense. Such rows are
    * dropped explicitly; within the horizon, late rows fold
    * normally. */
  def zscoreStreamByDay(spark: SparkSession, values: Dataset[TimedValue],
      lateness: String, sigmas: Int = 2): Dataset[ZscoreDayBatch] = {
    import spark.implicits._
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val k2 = sigmas.toLong * sigmas
    values
      .where(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(v => (v.group, utcDayIdx(v.ts)))
      .flatMapGroupsWithState[ZscoreState, ZscoreDayBatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rows: Iterator[TimedValue],
            state: GroupState[ZscoreState]) =>
          val (group, dayIdx) = key
          val dayEndMs = (dayIdx + 1) * 86400000L
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (!state.exists &&
              state.getCurrentWatermarkMs() >= dayEndMs) {
            // sealed day: its state is gone (or was never created) and
            // the watermark guarantees the batch aggregate no longer
            // counts rows this late — drop rather than resurrect
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(ZscoreState(0L, 0L, 0L))
            val batch = rows.filter(_.value != null)
              .map(_.value.longValue()).toArray
            if (batch.isEmpty) {
              // Spark clears the registered timeout on EVERY invocation
              // — a null-only batch for an open day must re-arm the
              // seal or the day's moments would pin forever
              if (state.exists) armDaySeal(state, dayEndMs)
              Iterator.empty
            } else {
              var n = prior.n; var s = prior.s; var ss = prior.ss
              batch.foreach { v => n += 1; s += v; ss += v * v }
              val rhs = k2 * (n * ss - s * s)
              val flagged = batch.count { v =>
                val dev = v * n - s
                dev * dev > rhs
              }
              state.update(ZscoreState(n, s, ss))
              // seal when the watermark passes the day's end; the
              // watermark already encodes the lateness allowance
              armDaySeal(state, dayEndMs)
              Iterator(ZscoreDayBatch(group, utcDayString(dayIdx),
                n, s, ss, flagged.toLong))
            }
          }
      }
  }

  final case class EwmaDayState(t: Long, recent: Array[Long],
      pending: Map[Long, Long])
  final case class EwmaDayPoint(group: String, day: String, t: Long,
      value: Long, ewma: Long)

  /** EVENT-TIME twin of [[ewmaStream]]: per-group DAILY totals smoothed
    * in event-time day order. EWMA is order-sensitive, so unlike the
    * z-score (an order-free sum) the stream cannot fold a value the
    * moment it arrives: a day's total is complete — and its position in
    * the series known — only once the watermark passes the day's end.
    * State per group: the open days' running totals (pending, bounded
    * by the lateness horizon) plus the ≤16-long trailing ladder over
    * CLOSED days. Each invocation folds the batch into pending, then
    * closes every pending day the watermark has passed IN DAY ORDER,
    * pushing its total through the q88 power-of-two ladder and emitting
    * the smoothed point. Days with no events are absent, exactly like
    * the batch twin's daily pre-aggregate (gap days are not zero
    * slots). The emitted series after any batch split bit-equals
    * ewmaSmooth over the same (group, day) totals (spec-asserted with
    * late arrivals). Over-late rows for an already-closed day are
    * dropped (the zscoreStreamByDay sealed-day guard — folding them
    * would change history the ladder already consumed).
    *
    * The group's state has no idle timeout: after all pending days
    * close it is the 16-long ladder, constant per group. Callers with
    * unbounded group churn should recreate the query periodically or
    * add an explicit retention sweep. */
  def ewmaStreamByDay(spark: SparkSession, values: Dataset[TimedValue],
      lateness: String): Dataset[EwmaDayPoint] = {
    import spark.implicits._
    values
      .where(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.group)
      .flatMapGroupsWithState[EwmaDayState, EwmaDayPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (group: String, rows: Iterator[TimedValue],
            state: GroupState[EwmaDayState]) =>
          val prior = state.getOption
            .getOrElse(EwmaDayState(0L, Array.empty[Long], Map.empty))
          val wm = state.getCurrentWatermarkMs()
          // fold the batch into pending day totals; a day whose end the
          // watermark already passed is sealed (its point may already
          // be emitted) — drop, never reopen
          var pending = prior.pending
          if (!state.hasTimedOut) {
            rows.filter(_.value != null).foreach { v =>
              val d = utcDayIdx(v.ts)
              if ((d + 1) * 86400000L > wm)
                pending = pending.updated(d, pending.getOrElse(d, 0L) + v.value.longValue())
            }
          }
          // close ripe days in day order through the ladder
          val (ripe, open) = pending.partition { case (d, _) =>
            (d + 1) * 86400000L <= wm
          }
          var recent = prior.recent
          var t = prior.t
          val out = ripe.toSeq.sortBy(_._1).map { case (d, total) =>
            recent = (total +: recent).take(16)
            var acc = 0L
            var j = 0
            while (j < recent.length) {
              acc += recent(j) * (1L << (15 - j)); j += 1
            }
            t += 1
            EwmaDayPoint(group, utcDayString(d), t, total, acc >> 16)
          }
          state.update(EwmaDayState(t, recent, open))
          // wake when the earliest open day becomes ripe; with no open
          // days the ladder rests (constant 16 longs) until new data.
          // No armDaySeal clamp needed: `open` holds only days whose
          // end is strictly past the CURRENT watermark (the partition
          // above uses this batch's wm, not the admission filter's)
          if (open.nonEmpty)
            state.setTimeoutTimestamp((open.keys.min + 1) * 86400000L)
          out.iterator
      }
  }

  final case class KeyedScore(group: String, item: String, score: java.lang.Long)
  final case class TopKState(n: Long, entries: Array[(String, Long)])

  /** The ONE leaderboard ordering (score desc, item asc), shared by the
    * arrival-time and event-time top-k forms so tie-breaks can never
    * drift. Score desc via Ordering.Long.reverse, NOT negation: -score
    * overflows at Long.MinValue (-MinValue == MinValue) and would sort
    * the worst score to rank 1. */
  private val leaderboardOrdering: Ordering[(String, Long)] =
    Ordering.by[(String, Long), (Long, String)] {
      case (item, score) => (score, item)
    }(Ordering.Tuple2(Ordering.Long.reverse, Ordering.String))
  final case class TopKEntry(group: String, n: Long, rank: Long, item: String,
      score: Long)

  /** Streaming exact top-k leaderboard per group: constant state of at
    * most k (item, score) entries, ordered (score desc, item asc).
    * After any prefix the emission equals the batch top-k over the
    * same observations PROVIDED each item carries at most one score
    * per key (the leaderboard contract — final scores, not deltas); a
    * re-observed item updates to max(old, new) while it remains in
    * the kept set, but a score evicted earlier is gone — constant
    * state cannot resurrect it (documented; feed per-item maxima for
    * exactness under duplicates). Emits the FULL current leaderboard
    * each batch a group receives data (≤ k rows, Append-safe), each
    * row carrying the monotone observation count `n` so an Append
    * sink's consumers can select the CURRENT leaderboard
    * (WHERE n = max(n) per group) — the ZscoreBatch/EwmaPoint marker
    * convention. Null items/scores are not observations; the
    * null-batch/timeout re-arm guards of the sketch streams apply. */
  def topKStream(spark: SparkSession, scores: Dataset[KeyedScore], k: Int,
      idleTimeout: Option[String] = Some("1 hour")): Dataset[TopKEntry] = {
    import spark.implicits._
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    implicit val ord: Ordering[(String, Long)] = leaderboardOrdering
    scores.groupByKey(_.group)
      .flatMapGroupsWithState[TopKState, TopKEntry](
        OutputMode.Append, timeoutConf) {
        (group: String, rows: Iterator[KeyedScore], state: GroupState[TopKState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows
              .filter(r => r.item != null && r.score != null)
              .map(r => r.item -> r.score.longValue()).toArray
            if (batch.isEmpty) {
              if (state.exists) idleTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            } else {
              val prior = state.getOption.getOrElse(TopKState(0L, Array.empty))
              // fold: per-item max across prior entries + batch, then
              // re-trim to k under (score desc, item asc)
              val merged = (prior.entries ++ batch)
                .groupBy(_._1).view.mapValues(_.map(_._2).max).toArray
                .sorted(ord).take(k)
              val n = prior.n + batch.length
              state.update(TopKState(n, merged))
              idleTimeout.foreach(state.setTimeoutDuration)
              merged.iterator.zipWithIndex.map { case ((item, score), i) =>
                TopKEntry(group, n, (i + 1).toLong, item, score)
              }
            }
          }
      }
  }

  final case class TimedItem(group: String, ts: java.sql.Timestamp,
      item: String)
  final case class CmDayEstimate(group: String, day: String, item: String,
      n: Long, estimate: Long)

  /** EVENT-TIME twin of [[countMinStream]]: one count-min sketch per
    * (group, event-time UTC day), watermarked, so a late event's count
    * lands in the day it HAPPENED in — the form a daily traffic /
    * abuse counter actually wants, where the arrival-time sketch would
    * smear a backfill across the wrong days. State: depth×width longs
    * per (group, open day), sealed by an event-time timeout once the
    * watermark passes the day's end — bounded by groups × days inside
    * the lateness horizon, NOT by history (the arrival-time form's
    * state is bounded only by its idle timeout). Emits (day, item,
    * post-fold estimate) for each distinct item of the batch, with the
    * day's monotone n as the currency marker (the ZscoreDayBatch
    * convention: a day's CURRENT estimates are its max-n emission).
    * Bit-compat law, spec-asserted: a day's final emission equals the
    * batch count-min over every row the watermark admitted for that
    * day — same cells ([[cmCells]]), same counters, late arrivals
    * included.
    *
    * Sealed-day guard (the zscoreStreamByDay contract):
    * flatMapGroupsWithState does not pre-filter late input — an
    * over-late row whose day's state the timeout already removed would
    * seed a FRESH sketch counting only stragglers and emit nonsense;
    * such rows are dropped explicitly. Null items are not
    * observations; a null-only batch allocates nothing for a new key
    * but re-arms an open day's seal (Spark clears the registered
    * timeout on every invocation). */
  def countMinStreamByDay(spark: SparkSession, items: Dataset[TimedItem],
      lateness: String, depth: Int = 4,
      width: Int = 1024): Dataset[CmDayEstimate] = {
    import spark.implicits._
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2 && width <= (1 << 26) && (width & (width - 1)) == 0,
      s"width must be a power of two in [2, 2^26], got $width")
    items
      .where(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(it => (it.group, utcDayIdx(it.ts)))
      .flatMapGroupsWithState[CmState, CmDayEstimate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rows: Iterator[TimedItem],
            state: GroupState[CmState]) =>
          val (group, dayIdx) = key
          val dayEndMs = (dayIdx + 1) * 86400000L
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (!state.exists &&
              state.getCurrentWatermarkMs() >= dayEndMs) {
            Iterator.empty // sealed day — drop, never resurrect
          } else {
            val prior = state.getOption
              .getOrElse(CmState(0L, new Array[Long](depth * width)))
            val counters = prior.counters.clone()
            var n = prior.n
            val seen = new scala.collection.mutable.LinkedHashSet[String]
            rows.filter(_.item != null).foreach { it =>
              cmCells(it.item, depth, width).foreach(counters(_) += 1)
              n += 1
              seen += it.item
            }
            if (seen.isEmpty) {
              if (state.exists) armDaySeal(state, dayEndMs)
              Iterator.empty
            } else {
              state.update(CmState(n, counters))
              armDaySeal(state, dayEndMs)
              val day = utcDayString(dayIdx)
              seen.iterator.map { item =>
                CmDayEstimate(group, day, item, n,
                  cmCells(item, depth, width).map(counters).min)
              }
            }
          }
      }
  }

  final case class TimedScore(group: String, ts: java.sql.Timestamp,
      item: String, score: java.lang.Long)
  final case class TopKDayEntry(group: String, day: String, n: Long,
      rank: Long, item: String, score: Long)

  /** EVENT-TIME twin of [[topKStream]]: one exact top-k leaderboard per
    * (group, event-time UTC day), watermarked — the daily-leaderboard
    * shape (top items of THE day, late data landing in its own day)
    * rather than the all-time arrival-order board. Same leaderboard
    * contract as the arrival-time form: per-item max on re-observation
    * while the item remains kept, constant ≤k-entry state per open day,
    * full current board emitted each batch the day receives data, the
    * monotone n selecting the day's current board from an Append sink.
    * Bit-compat law, spec-asserted: a day's final board equals the
    * batch top-k (score desc, item asc) over its watermark-admitted
    * per-item maxima. Sealed-day guard and null/timeout re-arm rules as
    * [[countMinStreamByDay]]. */
  def topKStreamByDay(spark: SparkSession, scores: Dataset[TimedScore],
      k: Int, lateness: String): Dataset[TopKDayEntry] = {
    import spark.implicits._
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    implicit val ord: Ordering[(String, Long)] = leaderboardOrdering
    scores
      .where(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(s => (s.group, utcDayIdx(s.ts)))
      .flatMapGroupsWithState[TopKState, TopKDayEntry](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rows: Iterator[TimedScore],
            state: GroupState[TopKState]) =>
          val (group, dayIdx) = key
          val dayEndMs = (dayIdx + 1) * 86400000L
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (!state.exists &&
              state.getCurrentWatermarkMs() >= dayEndMs) {
            Iterator.empty // sealed day — drop, never resurrect
          } else {
            val batch = rows
              .filter(r => r.item != null && r.score != null)
              .map(r => r.item -> r.score.longValue()).toArray
            if (batch.isEmpty) {
              if (state.exists) armDaySeal(state, dayEndMs)
              Iterator.empty
            } else {
              val prior = state.getOption.getOrElse(TopKState(0L, Array.empty))
              val merged = (prior.entries ++ batch)
                .groupBy(_._1).view.mapValues(_.map(_._2).max).toArray
                .sorted(ord).take(k)
              val n = prior.n + batch.length
              state.update(TopKState(n, merged))
              armDaySeal(state, dayEndMs)
              val day = utcDayString(dayIdx)
              merged.iterator.zipWithIndex.map { case ((item, score), i) =>
                TopKDayEntry(group, day, n, (i + 1).toLong, item, score)
              }
            }
          }
      }
  }

  final case class HllDayEstimate(group: String, day: String,
      n_items: Long, hll_est: Double)

  /** EVENT-TIME twin of [[hllDistinctStream]]: one HLL register array
    * per (group, event-time UTC day), watermarked — live DAILY distinct
    * users (the q98 sliding-distinct building block running as a
    * stream), where the arrival-time form counts a backfill into the
    * wrong day. Same register fold as every HLL in the repo
    * ([[hllFoldItem]] — the batch bit-compat law holds per day:
    * a day's final estimate equals [[graft.ops.Sketches.hllDistinct]]
    * over its watermark-admitted rows, spec-asserted with late
    * arrivals). State: m bytes per (group, open day), sealed by the
    * event-time timeout — bounded by groups × days inside the lateness
    * horizon. Sealed-day guard, null-item and timeout re-arm rules as
    * [[countMinStreamByDay]]; the day's monotone n_items is the
    * currency marker for Append-sink consumers. */
  def hllDistinctStreamByDay(spark: SparkSession, items: Dataset[TimedItem],
      lateness: String, p: Int = 9): Dataset[HllDayEstimate] = {
    import spark.implicits._
    val m = 1 << p
    items
      .where(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(it => (it.group, utcDayIdx(it.ts)))
      .flatMapGroupsWithState[HllState, HllDayEstimate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rows: Iterator[TimedItem],
            state: GroupState[HllState]) =>
          val (group, dayIdx) = key
          val dayEndMs = (dayIdx + 1) * 86400000L
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (!state.exists &&
              state.getCurrentWatermarkMs() >= dayEndMs) {
            Iterator.empty // sealed day — drop, never resurrect
          } else {
            val prior = state.getOption.getOrElse(HllState(0L, new Array[Byte](m)))
            val regs = prior.regs.clone()
            var n = prior.n
            val n0 = n
            rows.filter(_.item != null).foreach { it =>
              hllFoldItem(regs, it.item, p)
              n += 1
            }
            if (n == n0) {
              if (state.exists) armDaySeal(state, dayEndMs)
              Iterator.empty
            } else {
              state.update(HllState(n, regs))
              armDaySeal(state, dayEndMs)
              Iterator(HllDayEstimate(group, utcDayString(dayIdx), n,
                estimateFromRegs(regs, p)))
            }
          }
      }
  }

  /** hllEstimate's exact-integer arithmetic on a dense register array —
    * register value 0 means "never touched" (present registers always
    * carry rho >= 1, the hllRegisters invariant), the Σ2^−M sum is an
    * exact long, one IEEE division at the end, same small-range
    * correction and round-6 as the Catalyst form. */
  private def estimateFromRegs(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val rhoMax = 53 - p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < m) {
      if (regs(i) == 0) { zeros += 1; s += 1L << rhoMax }
      else s += 1L << (rhoMax - regs(i))
      i += 1
    }
    val raw = alpha * m * m * math.pow(2.0, rhoMax) / s
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Convenience: run a streaming DataFrame to completion against a
    * memory sink and return the result table (test/e2e harness). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Switch the session's streaming state store to RocksDB (with
    * changelog checkpointing) — the 100 TB state backend. The default
    * HDFS-backed provider keeps every store's working set as JVM-heap
    * maps: fine for the constant-state ops here (HLL registers, Bloom
    * bitmaps), lethal once keyed state approaches executor heap (large
    * key universes, long watermarks). RocksDB keeps state off-heap with
    * spill-to-disk, and changelog checkpointing uploads per-batch deltas
    * instead of full snapshots. Provider choice is a SESSION conf read
    * at query START and pinned into the checkpoint after that — call
    * this before `.start()`; an existing checkpoint keeps whichever
    * provider created it. Everything else (state schema, recovery
    * semantics, the ops' outputs) is provider-independent — asserted by
    * the StreamOpsSpec restart test running against this backend. */
  def withRocksDBStateStore(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    spark
  }

  /** Restore the default HDFS-backed state store provider (test
    * hygiene: provider is session-global, so suites flip it back). */
  def withDefaultStateStore(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark
  }
}
