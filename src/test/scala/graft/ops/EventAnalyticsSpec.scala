package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions.col

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hoursFromEpoch: Long): Timestamp =
    new Timestamp(hoursFromEpoch * 3600 * 1000L)

  test("funnel: ordered steps, conversion window, and monotone stage counts") {
    val events = Seq(
      // u1 converts fully in order within 72h
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      // u2 clicks outside the 72h window of funnel entry
      (2L, "view", ts(0)), (2L, "click", ts(100)),
      // u3's only click precedes the first view — order matters
      (3L, "click", ts(0)), (3L, "view", ts(1)),
      // u4 never enters the funnel (no view at all)
      (4L, "click", ts(0)), (4L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), horizonHours = 72)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, "view", 3L), (1L, "click", 1L), (2L, "purchase", 1L)))
  }

  test("funnel: purchase must follow the qualifying click, not just the view") {
    val events = Seq(
      // purchase lands between view and first qualifying click → not counted
      (1L, "view", ts(0)), (1L, "purchase", ts(1)), (1L, "click", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), horizonHours = 72)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 0L))
  }

  test("debounce: adjacent-gap suppression per (user, type), first kept") {
    val events = Seq(
      // u1 clicks at 0h, 1h, 30h: the 1h repeat is suppressed at a 24h
      // window, the 30h one is kept (adjacent gap 29h > 24h)
      (10L, 1L, "click", ts(0)), (11L, 1L, "click", ts(1)), (12L, 1L, "click", ts(30)),
      // different type interleaved: independent stream, always first
      (13L, 1L, "view", ts(0)),
      // different user: independent stream
      (14L, 2L, "click", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.debounce(events, "user_id", "event_type", "ts",
        "event_id", windowSeconds = 24 * 3600L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got(10L) == ((-1L, true)))
    assert(got(11L) == ((3600L * 1000000, false)))
    assert(got(12L) == ((29 * 3600L * 1000000, true)))
    assert(got(13L) == ((-1L, true)))
    assert(got(14L) == ((-1L, true)))
  }

  test("funnelOnePass equals the join formulation on tie-free logs") {
    // deterministic pseudo-random log with all-distinct timestamps
    val rng = new scala.util.Random(7)
    val types = Array("view", "click", "purchase", "error")
    val evs = (0 until 300).map { i =>
      (i.toLong, (rng.nextInt(12) + 1).toLong, types(rng.nextInt(4)), ts(i.toLong))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    val joined = EventAnalytics.funnel(evs, "user_id", "event_type", "ts", steps, 72)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val onePass = EventAnalytics.funnelOnePass(evs, "user_id", "event_type", "ts", steps, 72)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(onePass == joined)
    // and the one-pass plan carries exactly one data shuffle
    val df = EventAnalytics.funnelOnePass(evs, "user_id", "event_type", "ts", steps, 72)
    val exchanges = "(?<!Broadcast)Exchange [a-zA-Z]*[Hh]ash".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, df.queryExecution.executedPlan.toString)
  }

  test("funnelOnePass: majority non-step traffic changes nothing (pre-filtered)") {
    // 10 noise events per step event — the pre-filter keeps them out of
    // the per-user array; semantics must match the join form exactly
    val rng = new scala.util.Random(11)
    val noise = Array("scroll", "hover", "heartbeat", "resize", "focus",
      "blur", "error", "ping", "render", "idle")
    val stepEvs = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(0)), (3L, "view", ts(5)), (3L, "click", ts(6)))
    val noiseEvs = (0 until 60).map { i =>
      ((i % 4) + 1L, noise(rng.nextInt(noise.length)), ts(200 + i))
    }
    val evs = rng.shuffle(stepEvs ++ noiseEvs).toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val onePass = rows(EventAnalytics.funnelOnePass(
      evs, "user_id", "event_type", "ts", steps, 72))
    assert(onePass == rows(EventAnalytics.funnel(
      evs, "user_id", "event_type", "ts", steps, 72)))
    assert(onePass == Set((0L, "view", 3L), (1L, "click", 2L), (2L, "purchase", 1L)))
  }

  test("funnelOnePass: maxEventsPerUser excludes power users, audited not silent") {
    // u1 converts but fires 40 step events; u2 is a normal converter
    val power = (0 until 40).map(i =>
      (1L, Seq("view", "click", "purchase")(i % 3), ts(i.toLong)))
    val evs = (power ++ Seq(
      (2L, "view", ts(0)), (2L, "click", ts(1)), (2L, "purchase", ts(2))
    )).toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    def counts(maxPerUser: Int) = EventAnalytics.funnelOnePass(
        evs, "user_id", "event_type", "ts", steps, 72, maxPerUser)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // default (no cap): both users convert fully
    assert(counts(Int.MaxValue) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // cap 10 < u1's 40 step events: u1 leaves every stage count
    assert(counts(10) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    // and the exclusion is audited, not silent
    val ovf = EventAnalytics.funnelUserOverflow(
      evs, "user_id", "event_type", steps, 10).collect()
    assert(ovf.length == 1 && ovf(0).getAs[Long]("user") == 1L &&
      ovf(0).getAs[Long]("n_members") == 40L)
    assert(EventAnalytics.funnelUserOverflow(
      evs, "user_id", "event_type", steps, 40).isEmpty)
  }

  test("retentionCohorts: first-active-day cohorts with day offsets") {
    val events = Seq(
      // u1 active on day 0 and day 2 (two events on day 2 must not double-count)
      (1L, ts(0)), (1L, ts(48)), (1L, ts(50)),
      // u2 active on day 0 only; u3 cohorts on day 1
      (2L, ts(1)), (3L, ts(25))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("1970-01-01", 0L) -> 2L,
      ("1970-01-01", 2L) -> 1L,
      ("1970-01-02", 0L) -> 1L))
  }

  test("forwardFill carries the last non-null per key; leading nulls stay null") {
    import spark.implicits._
    val series = Seq(
      (1L, 1L, Some(10L)), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some(40L)),
      (2L, 1L, None), (2L, 2L, Some(7L)), (2L, 3L, None)
    ).toDF("key", "seq", "v")
    val got = EventAnalytics.forwardFill(series,
        Seq(col("key")), Seq(col("seq")), col("v"), as = "filled")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(
      (1L, 1L) -> Some(10L), (1L, 2L) -> Some(10L), (1L, 3L) -> Some(10L),
      (1L, 4L) -> Some(40L),
      (2L, 1L) -> None, (2L, 2L) -> Some(7L), (2L, 3L) -> Some(7L)))
    intercept[IllegalArgumentException] {
      EventAnalytics.forwardFill(series, Nil, Seq(col("seq")), col("v"), "f")
    }
  }

  test("linearInterpolate: exact weighted average, edge rows, known rows unchanged") {
    import spark.implicits._
    // key 1: known at t=100 (v=10) and t=200 (v=40); probes between and outside
    val series = Seq(
      (1L, 50L, None), (1L, 100L, Some(10L)), (1L, 130L, None),
      (1L, 175L, None), (1L, 200L, Some(40L)), (1L, 300L, None),
      (2L, 10L, None) // key with no observations at all
    ).toDF("key", "t", "v")
    val got = EventAnalytics.linearInterpolate(series,
        Seq(col("key")), Seq(col("t")), col("t"), col("v"), as = "i")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(
      (1L, 50L) -> Some(10L),   // before first: nearest observation
      (1L, 100L) -> Some(10L),  // known row: itself
      (1L, 130L) -> Some(19L),  // 10 + 30*(30/100) = 19 exactly
      (1L, 175L) -> Some(32L),  // 10 + 30*(75/100) = 32.5 -> floor 32
      (1L, 200L) -> Some(40L),
      (1L, 300L) -> Some(40L),  // after last: nearest observation
      (2L, 10L) -> None))       // no observations: stays null
    intercept[IllegalArgumentException] {
      EventAnalytics.linearInterpolate(series, Nil, Seq(col("t")),
        col("t"), col("v"), "i")
    }
  }

  test("anomalousDays flags exactly the day that breaks 2 sigma, via exact integer arithmetic") {
    // key "a": 9 quiet days of 10 events + one day of 100.
    // mean≈19, var dominated by the spike — only the spike exceeds 2σ.
    val rows =
      (0 until 9).flatMap(d => Seq.fill(10)(("a", ts(d * 24L)))) ++
        Seq.fill(100)(("a", ts(9 * 24L))) ++
        (0 until 10).flatMap(d => Seq.fill(5)(("b", ts(d * 24L)))) // constant key: σ=0
    val got = EventAnalytics.anomalousDays(
      rows.toDF("k", "t"), "k", "t", sigmas = 2)
      .select("key", "day", "x").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "1970-01-10", 100L)), got.mkString(","))
    // constant series: (x·n−s)² = 0 is NOT > 0 — zero variance flags nothing
    assert(!got.exists(_._1 == "b"))
  }

  test("ewmaSmooth replays the exact power-of-two recurrence with zero padding") {
    val series = Seq(("a", "d1", 65536L), ("a", "d2", 0L), ("a", "d3", 65536L))
      .toDF("key", "day", "v")
    val got = EventAnalytics.ewmaSmooth(series,
        Seq(col("key")), Seq(col("day")), col("v"), as = "ewma")
      .orderBy("day").select("ewma").as[Long].collect().toSeq
    // t1: 65536·2^15 / 2^16 = 32768
    // t2: (0·2^15 + 65536·2^14) / 2^16 = 16384
    // t3: (65536·2^15 + 0 + 65536·2^13) / 2^16 = 32768 + 8192
    assert(got == Seq(32768L, 16384L, 40960L), got.mkString(","))
    intercept[IllegalArgumentException] {
      EventAnalytics.ewmaSmooth(series, Nil, Seq(col("day")), col("v"), "e")
    }
  }

  test("sessionizeSegmented bit-equals sessionize — day-straddling and multi-day sessions stitched across segments") {
    def tsm(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000L)
    val day = 24 * 60L
    val rows = Seq(
      // u1: a session STRADDLING the day-0/day-1 boundary (events 20 min
      // apart across midnight), then a separate day-1 session
      ("u1", 1L, tsm(day - 30)), ("u1", 2L, tsm(day - 10)),
      ("u1", 3L, tsm(day + 10)), ("u1", 4L, tsm(day + 500)),
      // u3: the hot-user shape — bursts on many days, each day split
      // by a long midday gap (two sessions/day, none straddling)
      ) ++
      // u2: ONE unbroken session spanning THREE days — 25-min cadence
      // from day-1 into day-3, every interior day boundary a stitch
      // with break 0 (the multi-segment-session associativity case)
      (0 to 60).map(i => ("u2", 500L + i, tsm(day - 25 + i * 25L))) ++
      (0 until 5).flatMap { d =>
        Seq(("u3", 100L + d * 4, tsm(d * day + 60)),
          ("u3", 101L + d * 4, tsm(d * day + 70)),
          ("u3", 102L + d * 4, tsm(d * day + 700)),
          ("u3", 103L + d * 4, tsm(d * day + 720)))
      }
    val df = rows.toDF("user_id", "event_id", "ts")
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getLong(5)))
      .toSet
    val plain = canon(EventAnalytics.sessionize(
      df, "user_id", "ts", "event_id", gapSeconds = 1800L))
    val seg = canon(EventAnalytics.sessionizeSegmented(
      df, "user_id", "ts", "event_id", gapSeconds = 1800L))
    assert(seg == plain, s"seg $seg\nplain $plain")
    // sanity on the fixture itself: u1 has 2 sessions, u2 exactly 1
    // (the 3-day chain), u3 ten
    val perUser = plain.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perUser == Map("u1" -> 2, "u2" -> 1, "u3" -> 10), perUser.toString)
  }

  test("sessionizeAuto: hot user dispatches to the stitched (join-bearing) form, uniform keeps plain — identical results") {
    def tsm(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000L)
    // hot fixture: one user holds ~97% of events across 3 days
    val rows = (0 until 120).map(i => ("bot", 1000L + i, tsm(i * 37L))) ++
      Seq(("u1", 1L, tsm(5)), ("u2", 2L, tsm(9)), ("u3", 3L, tsm(13)))
    val df = rows.toDF("user_id", "event_id", "ts")
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getLong(5)))
      .toSet
    val auto = EventAnalytics.sessionizeAuto(
      df, "user_id", "ts", "event_id", gapSeconds = 1800L)
    assert(auto.queryExecution.executedPlan.toString.contains("Join"),
      "hot user must dispatch to the stitched (join-bearing) form")
    val plain = EventAnalytics.sessionizeAuto(
      df, "user_id", "ts", "event_id", gapSeconds = 1800L,
      saltOverride = Some(1L))
    assert(!plain.queryExecution.executedPlan.toString.contains("Join"),
      "uniform probe must keep the plain one-exchange form")
    assert(canon(auto) == canon(plain))
  }

  test("sessionizeSegmented: raw-row windows partition on (user, segment), never user alone; segment >= gap enforced") {
    val df = Seq(("u", 1L, ts(0)), ("u", 2L, ts(1))).toDF("user_id", "event_id", "ts")
    val plan = EventAnalytics.sessionizeSegmented(
        df, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .queryExecution.executedPlan.toString
    // the event-grain exchange must carry BOTH keys (a user-only raw-row
    // hashpartitioning would recreate the funnel this op removes)
    assert("hashpartitioning\\(user_id#\\d+, _seg#\\d+L".r
      .findFirstIn(plan).isDefined, plan)
    intercept[IllegalArgumentException] {
      EventAnalytics.sessionizeSegmented(df, "user_id", "ts", "event_id",
        gapSeconds = 1800L, segmentSeconds = 60L)
    }
  }

  test("intervalOverlap: closed-interval semantics, key scoping, multi-bucket pairs collapse to one row") {
    import spark.implicits._
    val h = 3600000000L // 1h in micros
    val a = Seq(
      (1L, 10L, 0L, 2 * h),          // overlaps b20 (touching) and b21
      (1L, 11L, 5 * h, 6 * h),       // disjoint from everything
      (2L, 12L, 0L, 10 * h)          // key 2: long interval, many buckets
    ).toDF("user_id", "iid", "s_us", "e_us")
    val b = Seq(
      (1L, 20L, 2 * h, 3 * h),       // touches a10 at exactly 2h -> overlap 0
      (1L, 21L, h / 2, h),           // inside a10 -> overlap h/2
      (2L, 22L, 4 * h, 12 * h),      // overlaps a12 across 7 shared buckets -> ONE row
      (3L, 23L, 0L, 100 * h)         // key 3: never pairs with key 1/2
    ).toDF("user_id", "iid", "s_us", "e_us")
    val got = EventAnalytics.intervalOverlap(a, b, "user_id", "iid",
        "s_us", "e_us", bucketSeconds = 3600L)
      .select(col("user_id"), col("a_id"), col("b_id"), col("overlap_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 10L, 20L, 0L),       // closed intervals: touching endpoints meet
      (1L, 10L, 21L, h / 2),
      (2L, 12L, 22L, 6 * h)), s"got $got")
  }
}
