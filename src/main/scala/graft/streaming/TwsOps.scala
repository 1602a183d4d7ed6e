package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, count, explode, max, md5, size,
  timestamp_micros, when}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode,
  TimerValues, ValueState, MapState}

/** Stateful streaming ops on the `transformWithState` API (Spark 4's
  * arbitrary-state processor — SPARK-46815), the successor to the
  * `(flat)mapGroupsWithState` forms in [[StreamOps]].
  *
  * Why a 100 TB pipeline cares about the API change: `mapGroupsWithState`
  * models a grouping key's state as ONE opaque value — every micro-batch
  * that touches the key deserializes the ENTIRE state, mutates it on the
  * JVM heap, and writes the whole blob back. For the constant-size states
  * in [[StreamOps]] (HLL registers, a debounce timestamp) that is fine;
  * for a GROWING per-key collection (the seen-set of a first-seen dedup)
  * it is O(|set|) serialization per batch and an eventual heap wall.
  * `transformWithState` exposes composite state primitives instead —
  * [[MapState]] here is per-ELEMENT point reads/writes against the
  * RocksDB state store, so a batch touching k items of an n-item
  * seen-set costs O(k), never O(n), and the set lives off-heap. State
  * TTL is declarative per state variable ([[TTLConfig]]) instead of
  * hand-rolled timeout plumbing.
  *
  * Backend contract: `transformWithState` REQUIRES the RocksDB state
  * store provider — call [[StreamOps.withRocksDBStateStore]] before
  * `.start()` (the HDFS-backed default provider fails the query at
  * start). That requirement is exactly the scale posture this library
  * already assumes for keyed state (see the StreamSoak numbers in
  * BASELINE.md).
  *
  * Each op here is the TWS re-expression of an operator that already has
  * a batch and/or mGWS form, and the spec asserts bit-equality against
  * those twins on the same rows — the unified-API contract the rest of
  * the streaming file follows.
  */
object TwsOps {

  final case class FirstSeen(group: String, item: String)

  /** TTL needs a clock: Spark 4.1 rejects a non-zero TTLConfig under any
    * TimeMode but ProcessingTime (StatefulProcessorHandleImpl
    * .validateTTLConfig throws at query START) — so the mode is derived
    * from whether a TTL was asked for, never hardcoded. Caveat that
    * follows: ProcessingTime mode triggers micro-batches CONTINUOUSLY
    * (each batch runs the TTL sweep even with no input), so
    * `processAllAvailable` livelocks and `Trigger.AvailableNow` does
    * not self-terminate — drive TTL'd queries with an interval trigger
    * or poll the sink (the spec does the latter). Every public op that
    * takes a TTL repeats this caveat — a hang is a worse failure mode
    * than the loud start-time throw this helper replaced. */
  private def modeFor(ttl: Option[java.time.Duration]): TimeMode =
    if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()

  /** Per-group exact first-seen filter: emits each (group, item) the
    * first time it arrives, drops every repeat — the streaming form of
    * `SELECT DISTINCT group, item` (and the exact-state cousin of
    * [[StreamOps.bloomDedupStream]], which spends 512 KB for an
    * approximate answer; this one spends one MapState entry per distinct
    * item for an exact one).
    *
    * State: `MapState[item, 1L]` per group — membership is the map key
    * itself. A micro-batch with k rows for a group performs at most k
    * point lookups + at most k point writes regardless of how many items
    * the group has accumulated; the mGWS formulation would read and
    * rewrite the full seen-set per batch (the scaladoc's O(n)-vs-O(k)
    * argument, asserted indirectly by the restart spec: state survives
    * a stop/start through the changelog, so it is genuinely in the
    * store, not replayed).
    *
    * `ttl`: optional processing-time TTL per seen-entry (e.g. "24 hours"
    * dedup horizon — the TWS analogue of dropDuplicatesWithinWatermark's
    * bounded-state contract, but per ELEMENT rather than per row-event).
    * None keeps entries for the query lifetime: exact global dedup,
    * state = one entry per distinct item, the caller owns the
    * cardinality budget (the d01 exact-dedup contract, streamed).
    * Some(ttl) switches the query to ProcessingTime TimeMode —
    * `processAllAvailable`/`AvailableNow` will NOT terminate (see
    * [[modeFor]]); drive with an interval trigger or poll the sink. */
  def firstSeenStream(spark: SparkSession, items: Dataset[StreamOps.KeyedItem],
      ttl: Option[java.time.Duration] = None): Dataset[FirstSeen] = {
    import spark.implicits._
    val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    items.filter(_.item != null) // null is "no item", the sketch-family rule
      .groupByKey(_.group)
      .transformWithState(new FirstSeenProcessor(ttlConf),
        modeFor(ttl), OutputMode.Append())
  }

  /** Streamed incremental dedup — the live form of d39: the seen-map
    * is BOOTSTRAPPED from an existing batch corpus (via
    * transformWithState's initial-state channel, loaded once at query
    * start straight into the state store), so the stream emits only
    * items novel against corpus ∪ stream-so-far. A crawl front-end
    * dedups against yesterday's corpus without replaying it through the
    * stream. Corpus items themselves are never emitted — they are
    * PRIOR state, not arrivals. */
  def firstSeenStreamWithCorpus(spark: SparkSession,
      items: Dataset[StreamOps.KeyedItem],
      corpus: Dataset[StreamOps.KeyedItem],
      ttl: Option[java.time.Duration] = None): Dataset[FirstSeen] = {
    import spark.implicits._
    val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val init = corpus.filter(_.item != null).groupByKey(_.group)
    items.filter(_.item != null)
      .groupByKey(_.group)
      .transformWithState(new FirstSeenProcessor(ttlConf),
        modeFor(ttl), OutputMode.Append(), init)
  }

  /** One processor, two front doors: with no initial state it is the
    * exact first-seen filter; with a corpus as initial state it is the
    * streamed d39 ([[firstSeenStreamWithCorpus]]). */
  private final class FirstSeenProcessor(ttlConf: TTLConfig)
      extends StatefulProcessorWithInitialState[String, StreamOps.KeyedItem,
        FirstSeen, StreamOps.KeyedItem] {
    @transient private var seen: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Long](
        "seen", Encoders.STRING, Encoders.scalaLong, ttlConf)

    override def handleInitialState(key: String,
        initialState: StreamOps.KeyedItem, timers: TimerValues): Unit =
      // called once per corpus row at query start: mark seen, emit
      // nothing (the corpus is prior knowledge, not an arrival)
      seen.updateValue(initialState.item, 1L)

    override def handleInputRows(key: String,
        rows: Iterator[StreamOps.KeyedItem],
        timers: TimerValues): Iterator[FirstSeen] =
      // strict evaluation: the rows iterator is only valid inside this
      // call, and the seen-state reads must happen in arrival order
      // (two copies of an item in ONE batch must emit exactly once)
      rows.flatMap { r =>
        if (seen.containsKey(r.item)) None
        else {
          seen.updateValue(r.item, 1L)
          Some(FirstSeen(key, r.item))
        }
      }.toVector.iterator
  }

  final case class SessEvent(user_id: Long, event_id: Long, ts_us: Long,
      ts: java.sql.Timestamp)
  final case class SessionEmit(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Gap-based sessionization on EVENT-TIME TIMERS — the
    * transformWithState feature the mGWS walks in [[StreamOps]]
    * hand-roll with sentinel "event wakes": a session emits exactly
    * when the watermark passes its end (last event + gap), because a
    * registered timer fires then — no polling, no per-batch re-walk of
    * pending state.
    *
    * Semantics twin [[graft.ops.EventAnalytics.sessionize]] (q107) and
    * `session_window` (q29): events ≤ `gapSeconds` apart merge
    * (touching merges), `session_end = last + gap`. Out-of-order
    * arrivals are handled with FULL session-merge semantics: each open
    * session is kept in a ListState; an event can extend a session,
    * open a new one, or BRIDGE two neighbours into one (their timers
    * are deleted, the merged session registers its own) — so any
    * arrival order within the watermark horizon produces the batch
    * boundaries, not just in-order replay. Rows older than the
    * watermark are dropped explicitly (the pinned late-row rule; the
    * session they would have joined may already have emitted). Note the
    * ENGINE's own late filter runs first and is strict —
    * eventTime ≤ watermark drops — so an event at exactly epoch 0 ties
    * the initial watermark and never reaches the processor (the
    * StreamSoak 1-origin rule; real pipelines never carry epoch-0
    * event times).
    *
    * State: open sessions per user — bounded by the watermark horizon
    * divided by the gap, NOT by history (emitted sessions leave the
    * store); one event-time timer per open session. Timer values are
    * ms-rounded session ends; two sessions of one user are > gap ≥ 1 s
    * apart, so timer values cannot collide (the require below). */
  def sessionizeTws(spark: SparkSession, events: Dataset[StreamOps.TypedEvent],
      gapSeconds: Long, watermark: String = "10 seconds"): Dataset[SessionEmit] = {
    import spark.implicits._
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds " +
      "(sub-second gaps would collide ms-rounded session timers)")
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .as[SessEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  private final class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionEmit] {
    // (startUs, lastUs, nEvents) per open session, unordered in the store
    @transient private var sessions: ListState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sessions = getHandle.getListState[(Long, Long, Long)]("sessions",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    /** Timer strictly after the session end: fires once the watermark
      * PASSES end (the session_window emission rule), never at a tying
      * watermark that a still-mergeable event could share. */
    private def timerMs(lastUs: Long): Long = (lastUs + gapUs) / 1000 + 1

    override def handleInputRows(key: Long, rows: Iterator[SessEvent],
        timers: TimerValues): Iterator[SessionEmit] = {
      val wmMs = timers.getCurrentWatermarkInMs
      val incoming = rows.toVector
        .filter(_.ts_us / 1000 >= wmMs) // pinned late-row rule
        .sortBy(e => (e.ts_us, e.event_id))
      if (incoming.isEmpty) return Iterator.empty
      var open = sessions.get().toVector
      val dead = scala.collection.mutable.LinkedHashSet.empty[Long]
      incoming.foreach { e =>
        val t = e.ts_us
        // mergeable iff the event's gap-window touches the session's:
        // start − gap ≤ t ≤ last + gap (≤ both sides — touching merges)
        val (merge, keep) = open.partition(s => t >= s._1 - gapUs && t <= s._2 + gapUs)
        if (merge.isEmpty) open = keep :+ ((t, t, 1L))
        else {
          merge.foreach(s => dead += timerMs(s._2))
          open = keep :+ ((math.min(t, merge.map(_._1).min),
            math.max(t, merge.map(_._2).max), merge.map(_._3).sum + 1L))
        }
      }
      sessions.clear()
      open.foreach(sessions.appendValue)
      dead.foreach(getHandle.deleteTimer)
      // re-registering an unchanged timer is idempotent; a deleted value
      // that an open session still needs is re-registered right here
      open.foreach(s => getHandle.registerTimer(timerMs(s._2)))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionEmit] = {
      val wmMs = timers.getCurrentWatermarkInMs
      val (due, remain) = sessions.get().toVector.partition(s => timerMs(s._2) <= wmMs)
      sessions.clear()
      remain.foreach(sessions.appendValue)
      due.sortBy(_._1)
        .map(s => SessionEmit(key, s._1, s._2 + gapUs, s._3)).iterator
    }
  }

  /** Running per-key (count, sum) — the [[StreamOps.runningTotals]]
    * operator re-expressed on ValueState. Emits the updated running
    * total for every key touched by the micro-batch (update semantics,
    * same contract as the mGWS form, asserted bit-equal in the spec).
    * `idleTtl` evicts state for keys idle longer than the duration —
    * declaratively, where the mGWS form hand-rolls
    * ProcessingTimeTimeout + hasTimedOut plumbing.
    *
    * The DEFAULT (Some(1 hour)) selects ProcessingTime TimeMode, under
    * which micro-batches trigger continuously: `processAllAvailable`
    * livelocks and `Trigger.AvailableNow` does not self-terminate (see
    * [[modeFor]]) — drive with an interval trigger or poll the sink,
    * or pass `idleTtl = None` (TimeMode.None, unbounded state) for the
    * drive-to-quiescence test pattern. */
  def runningTotalsTws(spark: SparkSession,
      events: Dataset[StreamOps.KeyedEvent],
      idleTtl: Option[java.time.Duration] = Some(java.time.Duration.ofHours(1)))
      : Dataset[StreamOps.RunningTotal] = {
    import spark.implicits._
    val ttlConf = idleTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor(ttlConf),
        modeFor(idleTtl), OutputMode.Update())
  }

  private final class RunningTotalProcessor(ttlConf: TTLConfig)
      extends StatefulProcessor[Long, StreamOps.KeyedEvent, StreamOps.RunningTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        ttlConf)

    override def handleInputRows(key: Long,
        rows: Iterator[StreamOps.KeyedEvent],
        timers: TimerValues): Iterator[StreamOps.RunningTotal] = {
      val (n0, total0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0
      var total = total0
      rows.foreach { e => n += 1; total += e.value }
      totals.update((n, total))
      Iterator.single(StreamOps.RunningTotal(key, n, total))
    }
  }

  final case class StreamDoc(doc_id: Long, text: String)
  final case class GramArrival(gram: String, doc_id: Long, n_grams: Long)
  final case class GramFlag(doc_id: Long, n_grams: Long, is_new: Boolean)

  /** Reference gram set for the novelty bootstrap: the DISTINCT md5
    * gram hashes of a batch corpus (d72's refSet projection — hashes
    * shuffle and sit in state, never text). Bounded state by
    * construction: one row per distinct reference gram, however many
    * documents contain it. */
  def referenceGrams(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3): org.apache.spark.sql.DataFrame =
    graft.ops.Dedup.withShingles(docs, idCol, textCol, shingleN)
      .select(explode(col("_grams")).as("_g"))
      .select(md5(col("_g")).as("gram"))
      .distinct()

  /** Streamed d72 — live per-increment novelty against a reference
    * corpus, completing the incremental-crawl story (d39's exact
    * first-seen side already streams): each arriving document explodes
    * to its distinct gram hashes, each gram's processor answers "known
    * or new?" against a ValueState seeded from [[referenceGrams]]
    * through the initial-state channel (the firstSeenStreamWithCorpus
    * bootstrap — the corpus is PRIOR state, loaded once at query
    * start, never replayed through the stream).
    *
    * `updateWithArrivals = true` additionally marks each new gram seen
    * AFTER its micro-batch completes, so a document is scored against
    * corpus ∪ strictly-earlier micro-batches — batch-granular on
    * purpose: within one micro-batch, co-arriving docs sharing a new
    * gram would otherwise score by shuffle arrival order, which is
    * non-deterministic (the flags are read pre-update for ALL of a
    * batch's rows, then the state writes once). false scores every
    * arrival against the FIXED corpus — exactly d72 streamed.
    *
    * Output is gram-grained (doc_id, n_grams, is_new) in Append mode;
    * fold with [[noveltyTally]] (per sink batch or on the collected
    * result) for d72's (doc_id, n_grams, n_new, novelty_ppm) rows —
    * bit-equal to Dedup.noveltyScore against the same prefix
    * (spec-asserted). State: one boolean per distinct gram ever known
    * — the same cardinality d72's refSet build side carries. */
  def noveltyStream(spark: SparkSession, docs: Dataset[StreamDoc],
      corpusGrams: Dataset[String], shingleN: Int = 3,
      updateWithArrivals: Boolean = true): Dataset[GramFlag] = {
    import spark.implicits._
    val arrivals = graft.ops.Dedup.withShingles(
        docs.toDF().where(col("doc_id").isNotNull && col("text").isNotNull),
        "doc_id", "text", shingleN)
      .where(size(col("_grams")) > 0)
      .select(col("doc_id"), size(col("_grams")).cast("long").as("n_grams"),
        explode(col("_grams")).as("_g"))
      .select(md5(col("_g")).as("gram"), col("doc_id"), col("n_grams"))
      .as[GramArrival]
    arrivals
      .groupByKey(_.gram)
      .transformWithState(new GramSeenProcessor(updateWithArrivals),
        TimeMode.None(), OutputMode.Append(), corpusGrams.groupByKey(identity))
  }

  /** Batch fold of [[noveltyStream]]'s gram flags to d72's output
    * shape: (doc_id, n_grams, n_new, novelty_ppm) with the same exact
    * integer ppm. Usable per sink micro-batch (foreachBatch) or on a
    * collected memory sink. */
  def noveltyTally(flags: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    flags.groupBy(col("doc_id"))
      .agg(max(col("n_grams")).as("n_grams"),
        count(when(col("is_new"), 1)).as("n_new"))
      .select(col("doc_id"), col("n_grams"), col("n_new"),
        org.apache.spark.sql.functions.expr(
          "(1000000L * n_new) div n_grams").as("novelty_ppm"))

  private final class GramSeenProcessor(updateWithArrivals: Boolean)
      extends StatefulProcessorWithInitialState[String, GramArrival,
        GramFlag, String] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInitialState(key: String, initialState: String,
        timers: TimerValues): Unit =
      seen.update(true)

    override def handleInputRows(key: String, rows: Iterator[GramArrival],
        timers: TimerValues): Iterator[GramFlag] = {
      // read the pre-batch state ONCE and flag every row of this batch
      // against it (strict materialization before the state write):
      // within-batch co-arrivals must score identically, not by
      // shuffle arrival order
      val wasSeen = seen.exists()
      val out = rows.map(r => GramFlag(r.doc_id, r.n_grams, !wasSeen)).toVector
      if (!wasSeen && updateWithArrivals) seen.update(true)
      out.iterator
    }
  }
}
