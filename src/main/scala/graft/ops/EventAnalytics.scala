package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over a (user, type, timestamp) log — the
  * product-analytics layer of the engine (sessionization's siblings:
  * ordered conversion funnels and cohort retention). Reference has no
  * event analytics (pure batch ELT, /root/reference/proj-eng-dados/
  * main.py); these are engine capabilities per SURVEY §2.7.
  *
  * Scale notes: every stage is keyed on the user id — the per-step
  * joins in [[funnel]] and the first-seen window in
  * [[retentionCohorts]] all shuffle on the same key, so Catalyst can
  * reuse exchanges, and no stage ever materializes an unkeyed window
  * over the full log.
  */
object EventAnalytics {

  /** Ordered conversion funnel: a user reaches stage i when an event of
    * type steps(i) occurs at-or-after their stage-(i−1) time, with the
    * WHOLE funnel inside `horizonHours` of the stage-0 entry (the
    * standard product-analytics "conversion window"). Stage times are
    * the earliest qualifying event (min), so the funnel is greedy and
    * deterministic; re-entries after the first qualifying event are
    * ignored.
    *
    * Plan: stage 0 is one hash-agg on user; each later stage is a join
    * of that step's (pre-filtered) events against the reached-so-far
    * frame — all shuffles keyed on user, work bounded by that step's
    * event volume. Stage frames nest by reference, so a k-step funnel
    * replays earlier stages' subtrees O(k²/2) times (no exchange reuse
    * across the aggregate branches); acceptable because k is a small
    * constant (funnels are 3–5 steps) and every replayed subtree is a
    * pushed-filter event slice + user-keyed agg — never the unfiltered
    * log. Output: (stage, step, n_users), one row per step, computed in
    * a single final 1-row aggregate unpivoted via explode (no per-stage
    * jobs). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizonHours: Int): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val entry = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user")).agg(min(col(tsCol)).as("t0"))
      .withColumn("deadline",
        col("t0") + expr(s"INTERVAL $horizonHours HOURS"))
    val perUser = steps.zipWithIndex.drop(1).foldLeft(entry) {
      case (acc, (step, i)) =>
        val stepTimes = events.where(col(typeCol) === step)
          .select(col(userCol).as("user"), col(tsCol).as("_ts"))
          .join(acc.select(col("user"), col(s"t${i - 1}"), col("deadline")),
            Seq("user"))
          .where(col("_ts") >= col(s"t${i - 1}") && col("_ts") <= col("deadline"))
          .groupBy(col("user")).agg(min(col("_ts")).as(s"t$i"))
        acc.join(stepTimes, Seq("user"), "left")
    }
    val stageCounts = steps.indices.map(i =>
      sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"_n$i"))
    perUser.agg(stageCounts.head, stageCounts.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i.toLong).as("stage"), lit(step).as("step"),
          col(s"_n$i").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.step").as("step"),
        col("r.n_users").as("n_users"))
  }

  /** Single-shuffle funnel: the same greedy-min funnel semantics as
    * [[funnel]], computed as a per-user state machine folded over the
    * user's time-sorted events with Catalyst higher-order functions —
    * ONE shuffle (the per-user collect) and one corpus pass, versus the
    * join formulation's O(k²/2) replayed slices. This is the shape to
    * prefer at 100 TB: per-user event counts are bounded in practice,
    * and the fold is codegen-friendly array arithmetic.
    *
    * State = array of k stage times (-1 = unreached); an event advances
    * at most one stage (entry, or the next step at-or-after the current
    * stage time and inside the stage-0 deadline). Semantics match
    * [[funnel]] exactly except when a stage-advancing event shares its
    * exact timestamp with the entry event of a DIFFERENT type: the join
    * form admits it unconditionally, the sorted walk admits it only in
    * (ts, type) order — microsecond event streams make such ties
    * measure-zero (equality on tie-free logs asserted in spec).
    *
    * Events whose type is not a funnel step are filtered out BEFORE the
    * per-user collect: they can never advance the fold (every branch
    * guards on `tp === steps(i)`), and on a real log where step events
    * are a small fraction of traffic the filter shrinks the one
    * unbounded per-user array by 10–1000×. Users with no step events
    * contribute 0 to every stage count either way, so semantics are
    * unchanged.
    *
    * `maxEventsPerUser` bounds that array against power-user skew: a
    * user with more step events than the cap is EXCLUDED from all stage
    * counts (same non-silent contract as the LSH bucket caps — audit
    * the exclusions with [[funnelUserOverflow]]). The default
    * Int.MaxValue disables the guard at zero plan cost; when set, the
    * guard window shuffles on the same user key the collect needs, so
    * it adds no exchange. */
  def funnelOnePass(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizonHours: Int,
      maxEventsPerUser: Int = Int.MaxValue): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val k = steps.size
    val horizonUs = horizonHours * 3600L * 1000000L
    val stepEvents = events.where(col(typeCol).isin(steps: _*))
    val bounded =
      if (maxEventsPerUser == Int.MaxValue) stepEvents
      else Dedup.capBuckets(stepEvents, Seq(userCol), maxEventsPerUser)
    val folded = bounded
      .groupBy(col(userCol).as("user"))
      .agg(array_sort(collect_list(struct(
        Tables.tsMicros(col(tsCol)).as("ts"), col(typeCol).as("tp")))).as("_evs"))
      .select(aggregate(col("_evs"), array_repeat(lit(-1L), k), (acc, e) => {
        val ts = e.getField("ts")
        val tp = e.getField("tp")
        var hit: Column = when(
          element_at(acc, 1) === -1L && tp === steps.head, lit(0))
        for (i <- 1 until k) {
          hit = hit.when(
            element_at(acc, i) =!= -1L && element_at(acc, i + 1) === -1L &&
              tp === steps(i) && ts >= element_at(acc, i) &&
              ts <= element_at(acc, 1) + horizonUs, lit(i))
        }
        val hitIdx = hit.otherwise(lit(-1))
        transform(acc, (v, j) => when(j === hitIdx, ts).otherwise(v))
      }).as("_st"))
    val stageCounts = steps.indices.map(i =>
      sum(when(element_at(col("_st"), i + 1) =!= -1L, 1L).otherwise(0L)).as(s"_n$i"))
    folded.agg(stageCounts.head, stageCounts.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i.toLong).as("stage"), lit(step).as("step"),
          col(s"_n$i").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.step").as("step"),
        col("r.n_users").as("n_users"))
  }

  /** Audit companion of funnelOnePass's `maxEventsPerUser` cap: the
    * users the cap would exclude at this threshold, with their step-event
    * counts (empty when nobody exceeds it). Same contract as
    * [[Dedup.minhashBucketOverflow]] — run it alongside any capped
    * funnel to log what the cap dropped. */
  def funnelUserOverflow(events: DataFrame, userCol: String,
      typeCol: String, steps: Seq[String],
      maxEventsPerUser: Int): DataFrame =
    Dedup.bucketOverflowOf(
      events.where(col(typeCol).isin(steps: _*))
        .select(col(userCol).as("user")),
      Seq("user"), maxEventsPerUser)

  /** Cohort retention matrix: users are cohorted by their first active
    * day; cell (cohort_day, day_offset) counts the cohort's users active
    * `day_offset` days later. Classic growth-analytics rollup.
    *
    * Plan: distinct (user, day) first — the log collapses to at most
    * users×days rows before anything else — then the cohort day is a
    * window MIN on user and the matrix one hash-agg; count(*) suffices
    * because rows are already distinct per (user, day). The cohort day
    * is emitted as an ISO string (the repo-wide oracle date
    * convention). */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col("user"))
    events.select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Repeat-event debounce: flag events arriving within `windowSeconds`
    * of the PREVIOUS same-(user, type) event — the batch form of
    * duplicate-suppression every event pipeline runs before counting
    * (double-clicks, retry storms, at-least-once delivery). Adjacent-gap
    * semantics (each event is judged against its immediate predecessor,
    * kept or not), NOT chained suppression — adjacent is expressible as
    * one lag() window on both engines, while chained suppression is
    * inherently iterative. Gap is exact integer microseconds; ties
    * order on the event id, so the verdict is total-order deterministic.
    * One shuffle, keyed on (user, type). */
  def debounce(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .select(col(idCol), col(userCol), col(typeCol), col(tsCol),
        Tables.tsMicros(col(tsCol)).as("_us"))
      .withColumn("gap_us",
        coalesce(col("_us") - lag(col("_us"), 1).over(w), lit(-1L)))
      .select(col(idCol), col(userCol), col(typeCol), col("gap_us"),
        (col("gap_us") === -1L ||
          col("gap_us") >= windowSeconds * 1000000L).as("kept"))
  }

  /** Gaps-and-islands sessionization: group each user's events into
    * sessions separated by ≥ `gapSeconds` of inactivity — the batch
    * twin of [[graft.streaming.StreamOps.sessionAgg]]'s session_window,
    * with IDENTICAL boundary semantics (a session's horizon is the
    * CLOSED interval [first, last + gap] — an event at exactly
    * last + gap still EXTENDS the session, which is what Spark's
    * session_window does with touching windows; session_end = last
    * event + gap) so the two forms are bit-comparable. The classic two-window shape: one lag() to flag
    * breaks, one running sum to number sessions, then a per-(user,
    * session) aggregate.
    *
    * Scale: ONE exchange keyed on the user — the lag window, the
    * running-sum window, and the final aggregate all cluster on
    * user-prefixed keys, so hashpartitioning(user) satisfies every
    * stage and nothing reshuffles. Gap arithmetic is exact integer
    * microseconds (the tsMicros seam); ties order on the event id
    * (the debounce contract), so session numbering is total-order
    * deterministic on both engines. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val w = Window.partitionBy(col(userCol)).orderBy(col("_us"), col(idCol))
    events
      .select(col(userCol), col(idCol), Tables.tsMicros(col(tsCol)).as("_us"))
      .withColumn("_brk",
        when(lag(col("_us"), 1).over(w).isNull ||
          col("_us") - lag(col("_us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        timestamp_micros(min(col("_us"))).as("session_start"),
        timestamp_micros(max(col("_us")) + gapUs).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("_us")) - min(col("_us"))).as("span_us"))
  }

  /** AUTO-DISPATCHED sessionization — the front door over
    * [[sessionize]] and [[sessionizeSegmented]], completing the
    * dispatch family (g06 components / q102 salted join / q109 running
    * sum): the caller stops hand-deciding "is my user key skewed?".
    * The probe is [[SkewJoin.skewReport]]'s top-1 suggested_salt over
    * the EVENT table's user column — ceil(heaviest user's rows / mean
    * partition's rows), one hash-agg + count-star (the d10-trainCap
    * bounded-driver-action class). At or under `threshold` (default 2)
    * → the plain one-exchange form; above it → the per-(user, segment)
    * split with boundary stitching, whose extra summary window + join
    * only pay when a bot/hub user would otherwise funnel one sorted
    * task (plain 1.40× at 100× skew and growing; segmented 0.75× —
    * BASELINE.md). Dispatch NEVER changes the result (both branches
    * are bit-equal by the segmentedRunningSum decomposition argument,
    * spec-pinned; q111 registers this front door against q107's
    * oracle). Pass `saltOverride` to skip the probe when the caller
    * already ran the report. */
  def sessionizeAuto(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long, segmentSeconds: Long = 86400L,
      threshold: Int = 2, saltOverride: Option[Long] = None): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val suggested = saltOverride.getOrElse {
      val parts = events.sparkSession.sessionState.conf.numShufflePartitions
      val top = SkewJoin.skewReport(events, userCol, topK = 1,
        numPartitions = parts).select(col("suggested_salt")).collect()
      if (top.isEmpty) 1L else top(0).getLong(0)
    }
    if (suggested > threshold)
      sessionizeSegmented(events, userCol, tsCol, idCol, gapSeconds,
        segmentSeconds)
    else sessionize(events, userCol, tsCol, idCol, gapSeconds)
  }

  /** SKEW-RESILIENT sessionization — [[sessionize]]'s per-(user,
    * segment) twin, the Ranking.segmentedRunningSum decomposition
    * applied to gaps-and-islands: the plain form puts every event of a
    * user into ONE sorted window task, so a bot/hub user holding α of
    * the corpus costs α·n rows in a single task at any parallelism
    * (measured 1.12×/1.40× at 10×/100× skew — BASELINE.md). Here the
    * raw-row windows partition on (user, segment) — a hot user's slice
    * splits across its `segmentSeconds` buckets (default 1 day) — and
    * sessions are STITCHED across segment boundaries:
    *
    *   1. within each (user, segment): lag-based break flags for
    *      non-first events, a running count of them, and the local
    *      min/max event time;
    *   2. per (user, segment) ONE summary row (first/last event,
    *      internal-break count); a per-user window over THESE rows
    *      (one per segment, not per event — the q101 offset-ladder
    *      grain) decides each boundary (gap from the previous
    *      segment's last event > gap ⇒ the segment's first event
    *      opens a session) and prefix-sums the per-segment break
    *      counts into each segment's session-id offset;
    *   3. joined back on (user, segment) — the step-1 exchange grain —
    *      session_seq = offset + within-segment running count, which
    *      IS the plain form's global break running sum decomposed
    *      (same argument as segmentedRunningSum's), so the output is
    *      bit-equal to [[sessionize]] — day-straddling and multi-day
    *      sessions included (spec-pinned on a day-straddling fixture).
    *
    * A session that spans MANY segments is still one session: each
    * interior boundary contributes break 0 and the offset ladder
    * carries its id unchanged — stitching is associative, no
    * iteration. The final per-(user, session) aggregate hash-aggs with
    * map-side partial rows (no sorted funnel; a single 10%-of-corpus
    * SESSION partially aggregates before the shuffle). Opt-in dial,
    * not the default (the segmentedRunningSum rule): on uniform users
    * the plain form is one exchange + two windows; this adds a
    * summary window and a join. Null users/segments ride the
    * null-safe join, as in segmentedRunningSum. */
  def sessionizeSegmented(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long,
      segmentSeconds: Long = 86400L): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    require(segmentSeconds >= gapSeconds,
      s"segmentSeconds ($segmentSeconds) must be >= gapSeconds ($gapSeconds) " +
        "— a segment shorter than the gap makes every boundary a stitch " +
        "candidate and the summary ladder grows past its purpose")
    val gapUs = gapSeconds * 1000000L
    val segUs = segmentSeconds * 1000000L
    // integer division on the micros: segment ids are non-decreasing in
    // _us and each id covers a contiguous _us interval, so (segment asc,
    // _us asc, id asc) is the plain form's global (ts, id) order. DIV
    // truncates toward zero (not floor), which only makes segment 0
    // double-width for pre-1970 timestamps — still one contiguous
    // interval, so the decomposition stays exact
    val base = events
      .select(col(userCol), col(idCol), Tables.tsMicros(col(tsCol)).as("_us"))
      .withColumn("_seg", expr(s"_us div ${segUs}L"))
    val wSeg = Window.partitionBy(col(userCol), col("_seg"))
      .orderBy(col("_us"), col(idCol))
    // within-segment: break flags for non-FIRST events only (the first
    // event's flag is the boundary decision, deferred to step 2);
    // running count includes the first event as 0 via coalesce
    val flagged = base
      .withColumn("_lag", lag(col("_us"), 1).over(wSeg))
      .withColumn("_brk_in",
        when(col("_lag").isNull, lit(0L))
          .otherwise(when(col("_us") - col("_lag") > gapUs, 1L).otherwise(0L)))
      .withColumn("_run_in", sum(col("_brk_in"))
        .over(wSeg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // one summary row per (user, segment): reuses the (user, _seg)
    // exchange (groupBy clusters on the window's partition keys)
    val summary = flagged
      .groupBy(col(userCol).as("_su"), col("_seg").as("_ss"))
      .agg(min(col("_us")).as("_first_us"), max(col("_us")).as("_last_us"),
        sum(col("_brk_in")).as("_n_brk_in"))
    val wUser = Window.partitionBy(col("_su")).orderBy(col("_ss"))
    val ladder = summary
      .withColumn("_prev_last", lag(col("_last_us"), 1).over(wUser))
      .withColumn("_first_brk",
        when(col("_prev_last").isNull ||
          col("_first_us") - col("_prev_last") > gapUs, 1L).otherwise(0L))
      .withColumn("_seg_brks", col("_n_brk_in") + col("_first_brk"))
      .withColumn("_offset", coalesce(sum(col("_seg_brks"))
        .over(wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_su"), col("_ss"), col("_first_brk"), col("_offset"))
    flagged
      .join(ladder,
        col(userCol) <=> col("_su") && col("_seg") <=> col("_ss"))
      // session_seq(e) = breaks in prior segments + this segment's
      // boundary flag + breaks within the segment up to e — exactly the
      // plain form's global break running sum, decomposed
      .withColumn("session_seq",
        col("_offset") + col("_first_brk") + col("_run_in"))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        timestamp_micros(min(col("_us"))).as("session_start"),
        timestamp_micros(max(col("_us")) + gapUs).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("_us")) - min(col("_us"))).as("span_us"))
  }

  /** Forward fill (LOCF — last observation carried forward): repair
    * missing values in a per-key time series with the latest preceding
    * non-null observation — the sensor-dropout / sparse-telemetry
    * repair step. One window over one exchange keyed on the partition
    * columns; a key's leading nulls stay null (nothing to carry).
    * `orderCols` must be a total order per key for deterministic
    * results (include a unique id alongside the timestamp — same
    * contract as debounce). */
  def forwardFill(df: DataFrame, partitionCols: Seq[Column],
      orderCols: Seq[Column], value: Column, as: String): DataFrame = {
    require(partitionCols.nonEmpty,
      "forwardFill needs partition columns — an unpartitioned fill would " +
        "move the whole table through one task (use globalRowNumber-style " +
        "two-phase plans for truly global series)")
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(value, ignoreNulls = true).over(w))
  }

  /** Linear interpolation between known observations — [[forwardFill]]'s
    * completion for gap REPAIR rather than carry: each row's value is
    * interpolated between the latest preceding and earliest following
    * non-null observation of its key, as the exact integer weighted
    * average (v_b·(t_f−t) + v_f·(t−t_b)) div (t_f−t_b) — every term
    * non-negative (values must be ≥ 0), so floor division agrees
    * across engines and the result is hash-exact with no float
    * boundary. Rows before the first / after the last observation take
    * the nearest single observation (the pandas `interpolate(
    * limit_direction='both')` edge rule); known rows return their own
    * value exactly (t_b = t_f guard). One exchange on the key, two
    * frames over it — same plan class as forwardFill, no joins.
    * Overflow bound: max value × max per-key gap in `tsMicros` units
    * must stay under 2⁶³ (integer cents × ten-day gaps is safe;
    * coarsen the time unit for sparser series). `orderCols` must
    * totally order rows per key (the forwardFill contract). */
  def linearInterpolate(df: DataFrame, partitionCols: Seq[Column],
      orderCols: Seq[Column], tsMicros: Column, value: Column,
      as: String): DataFrame = {
    require(partitionCols.nonEmpty,
      "linearInterpolate needs partition columns — an unpartitioned fill " +
        "would move the whole table through one task")
    val wb = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tKnown = when(value.isNotNull, tsMicros)
    val tb = last(tKnown, ignoreNulls = true).over(wb)
    val vb = last(when(value.isNotNull, value), ignoreNulls = true).over(wb)
    val tf = first(tKnown, ignoreNulls = true).over(wf)
    val vf = first(when(value.isNotNull, value), ignoreNulls = true).over(wf)
    df.withColumn("_t", tsMicros)
      .withColumn("_tb", tb).withColumn("_vb", vb)
      .withColumn("_tf", tf).withColumn("_vf", vf)
      .withColumn(as,
        when(col("_tb").isNull && col("_tf").isNull, lit(null))
          .when(col("_tb").isNull, col("_vf"))
          .when(col("_tf").isNull, col("_vb"))
          .when(col("_tf") === col("_tb"), col("_vb"))
          .otherwise(expr("(_vb * (_tf - _t) + _vf * (_t - _tb)) div (_tf - _tb)")))
      .drop("_t", "_tb", "_vb", "_tf", "_vf")
  }

  /** Days whose event count deviates more than `sigmas`·σ from the
    * key's own daily mean — the monitoring query over an event log
    * ("which days spiked"). The σ test runs entirely in exact integer
    * cross-multiplication — (x·n − s)² > sigmas²·(n·ss − s²) is the
    * |x − μ| > k·σ inequality with both sides scaled by n²
    * (n²σ² = n·ss − s²) — so there
    * is no sqrt, no float boundary, and a SQL oracle replays it
    * bit-exact. Overflow bound: (x·n)² < 2⁶³, i.e. max-daily-count ×
    * n-days < 3·10⁹ per key — years of daily buckets at under ~10⁶
    * events/day; beyond that, pre-aggregate to coarser buckets.
    *
    * Plan: one (key, day) hash-agg, one key-level re-aggregate
    * (#keys rows, AQE-broadcast back), the flag a narrow projection.
    * Output: anomalous (key, day, x, mean_milli) rows only; day is an
    * ISO string (the oracle date rule). */
  def anomalousDays(events: DataFrame, keyCol: String, tsCol: String,
      sigmas: Int = 2): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val daily = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.groupBy(col("key"))
      .agg(count(lit(1)).as("_n"), sum(col("x")).as("_s"),
        sum(col("x") * col("x")).as("_ss"))
    val dev = col("x") * col("_n") - col("_s")
    daily.join(stats, "key")
      .where(dev * dev >
        lit(sigmas.toLong * sigmas) *
          (col("_n") * col("_ss") - col("_s") * col("_s")))
      .select(col("key"), col("day"), col("x"),
        expr("(1000L * _s) div _n").as("mean_milli"))
  }

  /** Truncated exponentially-weighted moving average (α = 1/2,
    * window 16) of a per-key integer series:
    *   ewma_t = (Σ_{j=0..15} x_{t−j} · 2^(15−j)) >> 16
    * α = 1/2 makes every weight a power of two, so the smoothing is
    * EXACT long arithmetic (the pandas ewm(adjust=False) shape with a
    * zero seed: lags before the series start contribute 0) and a SQL
    * oracle replays it with 16 lag() terms. The final scale-down is an
    * ARITHMETIC RIGHT SHIFT — floor semantics — deliberately: Spark's
    * shiftright and DuckDB's >> agree on floor for negative
    * accumulators at any magnitude, whereas div/'//' truncate toward
    * zero and a power-of-two double division loses exactness past 2⁵³
    * (a negative revenue day — refunds — would silently diverge by 1).
    * One window pass over one key-partitioned exchange — the 16 lags
    * share the frame. `orderCols` must totally order each key's series
    * (the debounce contract). */
  def ewmaSmooth(df: DataFrame, partitionCols: Seq[Column],
      orderCols: Seq[Column], value: Column, as: String): DataFrame = {
    require(partitionCols.nonEmpty,
      "ewmaSmooth needs partition columns — an unpartitioned series " +
        "would move the whole table through one task")
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val acc = (0 until 16)
      .map(j => coalesce(lag(value, j).over(w), lit(0L)) * lit(1L << (15 - j)))
      .reduce(_ + _)
    df.withColumn(as, shiftright(acc, 16))
  }

  /** Key-scoped INTERVAL-OVERLAP join — the temporal theta-join shape
    * ("which of this user's A-intervals overlap which of their
    * B-intervals": concurrent sessions, ad exposure vs browsing,
    * on-call vs incident windows). Overlap is the closed-interval
    * predicate a_start ≤ b_end AND b_start ≤ a_end in exact integer
    * micros; each surviving pair carries overlap_us =
    * min(ends) − max(starts).
    *
    * Scale shape — why not join on the key alone: a hub key with s
    * intervals per side forms s² in-task pairs before the time filter
    * can run (the q29 funnel, squared). Instead each interval explodes
    * into its covering `bucketSeconds` buckets (sequence() — one
    * narrow generator, intervals/bucket bounded by real concurrency,
    * not key size) and the join equi-keys on (key, bucket): Spark
    * plans a plain hash join, an interval pair meets only in buckets
    * BOTH touch, and the distinct() collapses multi-bucket meetings
    * before the exact predicate. Quadratic work survives only WITHIN a
    * (key, bucket) cell — per-bucket concurrency, the honest lower
    * bound for overlap enumeration. Output is pair-level; aggregate
    * downstream (q113 folds per key).
    *
    * Both inputs: (key, id, start_us, end_us) with end ≥ start; ids
    * unique per side. */
  def intervalOverlap(a: DataFrame, b: DataFrame, keyCol: String,
      idCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds >= 1L, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val bUs = bucketSeconds * 1000000L
    def buckets(df: DataFrame, tag: String) = df.select(
        col(keyCol).as("_k"), col(idCol).as(s"${tag}_id"),
        col(startCol).as(s"${tag}_start_us"), col(endCol).as(s"${tag}_end_us"))
      .withColumn("_bkt", explode(sequence(
        expr(s"${tag}_start_us div ${bUs}L"), expr(s"${tag}_end_us div ${bUs}L"))))
    buckets(a, "a")
      .join(buckets(b, "b"), Seq("_k", "_bkt"))
      .where(col("a_start_us") <= col("b_end_us") &&
        col("b_start_us") <= col("a_end_us"))
      .select(col("_k").as(keyCol), col("a_id"), col("b_id"),
        col("a_start_us"), col("a_end_us"), col("b_start_us"), col("b_end_us"))
      .distinct()
      .withColumn("overlap_us",
        least(col("a_end_us"), col("b_end_us")) -
          greatest(col("a_start_us"), col("b_start_us")))
  }
}
