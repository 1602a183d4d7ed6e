package graft.queries

import graft.Tables
import graft.ops.{EventAnalytics, Relevance}
import org.apache.spark.sql.functions._

/** Round-7 signal batch: full-text relevance over the documents table
  * (t12 BM25, t13 TF-IDF) and time-series monitoring over the event
  * log (q87 σ-anomaly days, q88 exact EWMA). All four run on the
  * integer quantization ladders documented in their ops, so every
  * oracle is hash-exact.
  */
object SignalQueries {

  /** BM25 corpus probe: rank documents against a 3-term query mixing
    * one rare term ("dup", df≈25/500 — high idf) with two common ones
    * — the discrimination profile that separates BM25 from raw tf.
    * See Relevance.bm25TopDocs for the milli ladder and the rational-
    * idf variant note. */
  val t12Bm25 = NamedQuery(
    "t12_bm25",
    (s, dir) => Relevance.bm25TopDocs(
      Tables.documents(s, dir), "doc_id", "text",
      queryTerms = Seq("dup", "spark", "scan"), k = 20),
    Some("""WITH b2 AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
           |         string_split(text, ' ') AS toks
           |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |                 CAST(SUM(len) AS BIGINT) AS l_tot FROM b2),
           |tf AS (SELECT doc_id, len, term, CAST(COUNT(*) AS BIGINT) AS tf
           |       FROM (SELECT doc_id, len, unnest(toks) AS term FROM b2)
           |       WHERE term IN ('dup', 'spark', 'scan') GROUP BY 1, 2, 3),
           |dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           |sc AS (SELECT doc_id,
           |         (2200 * tf * (((2 * (n_docs - df) + 1) * 1000) // (2 * df + 1)))
           |         // (1000 * tf + 300
           |             + (9 * ((1000 * len * n_docs) // l_tot)) // 10) AS s
           |       FROM tf JOIN dfx USING (term), stats)
           |SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_milli,
           |       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
           |FROM sc GROUP BY 1
           |ORDER BY score_milli DESC, doc_id LIMIT 20""".stripMargin))

  /** TF-IDF top-5 terms per document (rational idf — see
    * Relevance.tfidfTopTerms): the "what is this doc about" card. */
  val t13TfidfTerms = NamedQuery(
    "t13_tfidf_terms",
    (s, dir) => Relevance.tfidfTopTerms(
      Tables.documents(s, dir), "doc_id", "text", k = 5),
    Some("""WITH tf AS (
           |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |        FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL)
           |  GROUP BY 1, 2),
           |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
           |       WHERE text IS NOT NULL AND doc_id IS NOT NULL),
           |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           |             CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
           |sc AS (SELECT doc_id, term, tf, df, cf,
           |              tf * ((n_docs * 1000000) // df) AS score_scaled
           |       FROM tf JOIN d USING (term), nd),
           |rk AS (SELECT *, CAST(row_number() OVER (
           |         PARTITION BY doc_id ORDER BY score_scaled DESC, term) AS BIGINT) AS rank
           |       FROM sc)
           |SELECT doc_id, term, tf, df, cf, CAST(score_scaled AS BIGINT) AS score_scaled, rank
           |FROM rk WHERE rank <= 5""".stripMargin))

  /** Daily-count anomaly scan per event type at 2σ — the ops-dashboard
    * "which days spiked" over the event log. Integer cross-multiplied σ
    * test; see EventAnalytics.anomalousDays. */
  val q87AnomalyDays = NamedQuery(
    "q87_anomaly_days",
    (s, dir) => EventAnalytics.anomalousDays(
      Tables.events(s, dir), "event_type", "ts", sigmas = 2),
    Some("""WITH daily AS (
           |  SELECT event_type AS key, strftime(ts, '%Y-%m-%d') AS day,
           |         CAST(COUNT(*) AS BIGINT) AS x
           |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           |  GROUP BY 1, 2),
           |st AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
           |              CAST(SUM(x) AS BIGINT) AS s,
           |              CAST(SUM(x * x) AS BIGINT) AS ss
           |       FROM daily GROUP BY 1)
           |SELECT daily.key, day, x, (1000 * s) // n AS mean_milli
           |FROM daily JOIN st ON daily.key = st.key
           |WHERE (x * n - s) * (x * n - s) > 4 * (n * ss - s * s)""".stripMargin))

  /** Exact EWMA (α = 1/2, window 16) of daily revenue-cents per event
    * type — trend smoothing whose every weight is a power of two, so
    * the whole series is long arithmetic and the oracle replays it
    * with 16 lag() terms and the same arithmetic >> 16 (floor on both
    * engines even for refund-negative days — NOT '//', which truncates
    * toward zero). See EventAnalytics.ewmaSmooth. */
  val q88Ewma = NamedQuery(
    "q88_ewma",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type").as("key"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      EventAnalytics.ewmaSmooth(daily,
        partitionCols = Seq(col("key")), orderCols = Seq(col("day")),
        value = col("v"), as = "ewma")
    },
    Some {
      val lags = (0 until 16)
        .map(j => s"coalesce(lag(v, $j) OVER w, 0) * ${1L << (15 - j)}")
        .mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type AS key, strftime(ts, '%Y-%m-%d') AS day,
         |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
         |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT key, day, v, ($lags) >> 16 AS ewma
         |FROM daily
         |WINDOW w AS (PARTITION BY key ORDER BY day)""".stripMargin
    })

  /** Rolling 7-day revenue per order priority via a RANGE window frame
    * — the frame family q15/q16/q46's ROWS windows don't cover: RANGE
    * over an integer day index sums every peer day in [d−6, d], with
    * gap days (no orders) correctly absent from the sum rather than
    * consuming a row slot. The order key is an epoch-day integer, so
    * frame boundaries are exact on both engines; revenue is cents. One
    * window over one priority-keyed exchange (daily pre-aggregate
    * first — the window runs over #days rows per priority, not raw
    * orders). */
  val q89RollingRange = NamedQuery(
    "q89_rolling_range",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .where(col("o_orderpriority").isNotNull && col("o_orderdate").isNotNull)
        .groupBy(col("o_orderpriority"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long").as("day_idx"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("day_cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("day_idx"))
        .rangeBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
      daily.select(col("o_orderpriority"), col("day_idx"), col("day_cents"),
        sum(col("day_cents")).over(w).as("rolling7_cents"))
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority,
           |         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_idx,
           |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
           |  FROM orders
           |  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
           |  GROUP BY 1, 2)
           |SELECT o_orderpriority, day_idx, day_cents,
           |       CAST(SUM(day_cents) OVER (
           |         PARTITION BY o_orderpriority ORDER BY day_idx
           |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling7_cents
           |FROM daily""".stripMargin))

  /** Gaps-and-islands: each user's longest consecutive-active-day
    * streak from the event log, top-20. The classic island key
    * day_idx − row_number is constant exactly while days are
    * consecutive — all integer, both engines. Plan: (user, day)
    * dedup-agg, one user-keyed window (islands), island-length agg,
    * per-user max, global top-20 as TakeOrderedAndProject. Every stage
    * is user-keyed — Catalyst reuses the exchange across the three
    * user-keyed steps. */
  val q90Streaks = NamedQuery(
    "q90_streaks",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day_idx"))
      Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast("long").as("day_idx"))
        .agg(count(lit(1)).as("_n"))
        .select(col("user_id"), col("day_idx"),
          (col("day_idx") - row_number().over(w)).as("island"))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("streak_days"))
        .groupBy(col("user_id"))
        .agg(max(col("streak_days")).as("longest_streak"))
        .orderBy(col("longest_streak").desc, col("user_id"))
        .limit(20)
    },
    Some("""WITH days AS (
           |  SELECT user_id,
           |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_idx
           |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           |  GROUP BY 1, 2),
           |isl AS (SELECT user_id, day_idx,
           |               day_idx - CAST(row_number() OVER (
           |                 PARTITION BY user_id ORDER BY day_idx) AS BIGINT) AS island
           |        FROM days),
           |st AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS streak_days
           |       FROM isl GROUP BY 1, 2)
           |SELECT user_id, CAST(MAX(streak_days) AS BIGINT) AS longest_streak
           |FROM st GROUP BY 1
           |ORDER BY longest_streak DESC, user_id LIMIT 20""".stripMargin))

  /** The value-function window family (first_value / last_value /
    * nth_value / lead / lag) in one pass — the navigation complement
    * of q74's ranking functions. first/last/nth read the FULL
    * partition via an explicit unbounded frame (the default frame
    * stops at the current row, where last_value degenerates to the
    * current value — the classic window gotcha, made explicit on both
    * engines); lead/lag use the default frame. Partition key is
    * (priority × month), not priority alone (the q74 5-value-key
    * rule); (day, orderkey) makes the order total so edge NULLs from
    * lead/lag land on identical rows in both engines. One window
    * shuffle serves all five functions. */
  val q91ValueFunctions = NamedQuery(
    "q91_value_functions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val part = Seq(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      val w = Window.partitionBy(part: _*)
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        cents.as("cents"),
        first(cents).over(wFull).as("first_cents"),
        last(cents).over(wFull).as("last_cents"),
        nth_value(cents, 3).over(wFull).as("third_cents"),
        lead(cents, 1).over(w).as("next_cents"),
        lag(cents, 1).over(w).as("prev_cents"))
    },
    Some("""SELECT o_orderkey, o_orderpriority,
           |       strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
           |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           |       first_value(CAST(round(o_totalprice * 100) AS BIGINT)) OVER wf AS first_cents,
           |       last_value(CAST(round(o_totalprice * 100) AS BIGINT)) OVER wf AS last_cents,
           |       nth_value(CAST(round(o_totalprice * 100) AS BIGINT), 3) OVER wf AS third_cents,
           |       lead(CAST(round(o_totalprice * 100) AS BIGINT), 1) OVER w AS next_cents,
           |       lag(CAST(round(o_totalprice * 100) AS BIGINT), 1) OVER w AS prev_cents
           |FROM orders
           |WINDOW w AS (PARTITION BY o_orderpriority, strftime(CAST(o_orderdate AS DATE), '%Y-%m')
           |             ORDER BY o_orderdate, o_orderkey),
           |       wf AS (PARTITION BY o_orderpriority, strftime(CAST(o_orderdate AS DATE), '%Y-%m')
           |              ORDER BY o_orderdate, o_orderkey
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin))

  /** Trailing-7-day DISTINCT users per event type — the sliding
    * distinct count that window functions cannot express (COUNT
    * (DISTINCT) OVER is unsupported in Spark, and per-day distincts
    * don't sum). The scale-first construction: each distinct
    * (type, day, user) row is EXPLODED to the 7 target days it
    * contributes to (a narrow ×7 expansion — no self-join of the
    * log), target days restrict to observed days via a broadcast-size
    * join, and one distinct-aggregate shuffle keyed on
    * (type, target-day) — thousands of keys — does the counting.
    * The per-type window formulation would funnel each type's whole
    * user-day history through one task (the q74 trap). At
    * billion-user scale, swap countDistinct for the q65 grouped-HLL
    * registers — same frame, sketch-sized state. */
  /** The (event_type, target-day, user) contribution frame shared by
    * q92 (exact) and q98 (sketch): each distinct (type, day, user)
    * exploded to its 7 target days, restricted to observed days. */
  private def sliding7dFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val du = Tables.events(s, dir)
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_type"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long").as("day_idx"),
        col("user_id"))
      .distinct()
    val days = du.select(col("event_type"), col("day_idx")).distinct()
    val contrib = du
      .withColumn("_k", explode(sequence(lit(0L), lit(6L))))
      .select(col("event_type").as("_t"), (col("day_idx") + col("_k")).as("_td"),
        col("user_id"))
    contrib.join(days,
        contrib("_t") === days("event_type") && contrib("_td") === days("day_idx"))
      .select(col("event_type"), col("day_idx"), col("user_id"))
  }

  val q92SlidingDistinct = NamedQuery(
    "q92_sliding_distinct",
    (s, dir) => {
      sliding7dFrame(s, dir)
        .groupBy(col("event_type"), col("day_idx"))
        .agg(countDistinct(col("user_id")).as("users_7d"))
    },
    Some("""WITH du AS (
           |  SELECT DISTINCT event_type,
           |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_idx,
           |         user_id
           |  FROM events
           |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
           |days AS (SELECT DISTINCT event_type, day_idx FROM du),
           |contrib AS (
           |  SELECT du.event_type AS t, du.day_idx + k.k AS td, du.user_id
           |  FROM du CROSS JOIN (SELECT unnest(range(7)) AS k) k)
           |SELECT days.event_type, days.day_idx,
           |       CAST(COUNT(DISTINCT contrib.user_id) AS BIGINT) AS users_7d
           |FROM contrib JOIN days
           |  ON contrib.t = days.event_type AND contrib.td = days.day_idx
           |GROUP BY 1, 2""".stripMargin))

  /** q92's billion-user form, registered and oracle-checked rather than
    * a scaladoc promise: the SAME explode-to-target-days frame counted
    * with the q65 grouped-HLL registers over the composite
    * (event_type, day) key. Exact sliding distinct shuffles every
    * (type, day, user) contribution; the sketch shuffles at most
    * groups x 512 register rows — constant per group however many users
    * a day sees. The DuckDB oracle replays the identical md5-register
    * ladder (52-bit hash, register = low 9 bits, exact-integer
    * 2^(44-M) register sum, small-range correction), so the estimate
    * is hash-exact across engines, not approximately compared. */
  val q98SlidingDistinctHll = NamedQuery(
    "q98_sliding_distinct_hll",
    (s, dir) => {
      graft.ops.Sketches.hllDistinctByGroups(sliding7dFrame(s, dir),
        Seq("event_type", "day_idx"), "user_id", p = 9, as = "hll_users_7d")
    },
    Some("""WITH du AS (
           |  SELECT DISTINCT event_type,
           |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_idx,
           |         user_id
           |  FROM events
           |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
           |days AS (SELECT DISTINCT event_type, day_idx FROM du),
           |contrib AS (
           |  SELECT du.event_type AS t, du.day_idx + k.k AS td, du.user_id
           |  FROM du CROSS JOIN (SELECT unnest(range(7)) AS k) k),
           |j AS (SELECT days.event_type, days.day_idx, contrib.user_id
           |      FROM contrib JOIN days
           |        ON contrib.t = days.event_type AND contrib.td = days.day_idx),
           |h AS (SELECT event_type, day_idx,
           |             md5_number_upper(CAST(user_id AS VARCHAR)) & ((1::BIGINT << 52) - 1) AS hp
           |      FROM j),
           |b AS (SELECT event_type, day_idx, hp & 511 AS reg, hp >> 9 AS w FROM h),
           |r AS (SELECT event_type, day_idx, reg,
           |             MAX(CASE WHEN w = 0 THEN 44 ELSE 44 - length(bin(w)) END) AS M
           |      FROM b GROUP BY 1, 2, 3),
           |agg AS (SELECT event_type, day_idx,
           |               CAST(SUM(1::BIGINT << CAST(44 - M AS INT)) AS BIGINT)
           |                 + (512 - COUNT(M)) * 17592186044416 AS s,
           |               512 - COUNT(M) AS zeros
           |        FROM r GROUP BY 1, 2)
           |SELECT event_type, day_idx,
           |       round(CASE WHEN (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s <= 1280.0
           |                       AND zeros > 0
           |                  THEN 512 * ln(512.0 / zeros)
           |                  ELSE (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s END, 6) AS hll_users_7d
           |FROM agg""".stripMargin))

  /** Grouped OLS trend: slope and intercept of daily revenue vs time
    * per event type — q58's Pearson machinery pointed at "is this
    * metric trending". All five regression sums are exact longs; the
    * slope is ONE IEEE division of two exact longs and the intercept
    * two IEEE ops on it — deterministic on both engines, no rounding
    * needed. Overflow management: x is the day offset from the
    * corpus' first day (broadcast one-row min — raw epoch days would
    * square into n·Σxy), and y is whole DOLLARS (cents div 100, both
    * engines truncate toward zero): n·Σxy < days²·max_daily_dollars·n
    * stays under 2⁶³ through ~100× this corpus; cents would overflow
    * at ~sf1. */
  // the OLS slope over the five exact-long sums — ONE definition feeds
  // both the slope column and the intercept that must stay consistent
  // with it
  private def slopeCol =
    (col("n_days") * col("_sxy") - col("_sx") * col("_sy")).cast("double") /
      (col("n_days") * col("_sxx") - col("_sx") * col("_sx")).cast("double")

  val q97TrendRegression = NamedQuery(
    "q97_trend_regression",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast("long").as("_d"))
        .agg(graft.Exact.centsSumDollars("value").as("_y"))
      val minDay = daily.agg(min(col("_d")).as("_d0"))
      daily.crossJoin(broadcast(minDay))
        .select(col("event_type"), (col("_d") - col("_d0")).as("_x"), col("_y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
          sum(col("_x") * col("_y")).as("_sxy"),
          sum(col("_x") * col("_x")).as("_sxx"))
        .select(col("event_type"), col("n_days"), slopeCol.as("slope_dollars_per_day"),
          ((col("_sy").cast("double") - slopeCol * col("_sx").cast("double")) /
            col("n_days")).as("intercept_dollars"))
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
           |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) // 100 AS y
           |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           |  GROUP BY 1, 2),
           |xy AS (SELECT event_type, d - (SELECT MIN(d) FROM daily) AS x, y FROM daily),
           |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           |             CAST(SUM(x * y) AS BIGINT) AS sxy,
           |             CAST(SUM(x * x) AS BIGINT) AS sxx
           |      FROM xy GROUP BY 1)
           |SELECT event_type, n_days,
           |       CAST(n_days * sxy - sx * sy AS DOUBLE)
           |         / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope_dollars_per_day,
           |       (CAST(sy AS DOUBLE)
           |        - (CAST(n_days * sxy - sx * sy AS DOUBLE)
           |           / CAST(n_days * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
           |         / n_days AS intercept_dollars
           |FROM s""".stripMargin))

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): adjacent
    * word pairs across the corpus form a weighted undirected
    * co-occurrence graph (weight = pair frequency), weighted PageRank
    * ranks the terms, top-20 are the corpus keywords — the
    * graph-centrality alternative to t13's tf-idf (a term scores high
    * for sitting between many well-connected terms, not for raw
    * counts). Exact integer micros via Graph.pageRankWeighted, rounds
    * unrolled in the oracle (the g02 rule); self-pairs (a word
    * repeated back-to-back) and empty tokens are excluded on both
    * sides. Scale shape: the bigram derivation is one pass + one
    * (u, v) hash-agg — linear in tokens, never a doc self-join — and
    * the PR rounds are pageRankWeighted's documented edge-linear
    * exchanges. */
  val t14Textrank = NamedQuery(
    "t14_textrank",
    (s, dir) => {
      val toks = split(col("text"), " ")
      val pairs = arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("a"),
        slice(toks, lit(2), size(toks) - 1).as("b"))
      val e = Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(explode(pairs).as("p"))
        .select(least(col("p.a"), col("p.b")).as("u"),
          greatest(col("p.a"), col("p.b")).as("v"))
        .where(col("u") =!= col("v") && col("u") =!= lit("") && col("v") =!= lit(""))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("w"))
      graft.ops.Graph.pageRankWeighted(e, iters = 3)
        .orderBy(col("pr").desc, col("node"))
        .limit(20)
        .select(col("node").as("term"), col("pr"))
    },
    Some("""WITH tk AS (SELECT string_split(text, ' ') AS ts FROM documents
           |            WHERE text IS NOT NULL),
           |pos AS (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM tk),
           |bg AS (SELECT least(ts[i], ts[i + 1]) AS u,
           |              greatest(ts[i], ts[i + 1]) AS v FROM pos),
           |e AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w FROM bg
           |      WHERE u <> v AND u <> '' AND v <> '' GROUP BY 1, 2),
           |ed AS (SELECT u AS s, v AS t, w FROM e
           |       UNION ALL SELECT v, u, w FROM e),
           |wd AS (SELECT s AS node, CAST(SUM(w) AS BIGINT) AS wd FROM ed GROUP BY 1),
           |p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM wd),
           |c1 AS (SELECT ed.t AS node, CAST(SUM((p.pr * ed.w) // d.wd) AS BIGINT) AS sm
           |       FROM ed JOIN p0 p ON ed.s = p.node JOIN wd d ON ed.s = d.node GROUP BY 1),
           |p1 AS (SELECT node, 150000 + (85 * sm) // 100 AS pr FROM c1),
           |c2 AS (SELECT ed.t AS node, CAST(SUM((p.pr * ed.w) // d.wd) AS BIGINT) AS sm
           |       FROM ed JOIN p1 p ON ed.s = p.node JOIN wd d ON ed.s = d.node GROUP BY 1),
           |p2 AS (SELECT node, 150000 + (85 * sm) // 100 AS pr FROM c2),
           |c3 AS (SELECT ed.t AS node, CAST(SUM((p.pr * ed.w) // d.wd) AS BIGINT) AS sm
           |       FROM ed JOIN p2 p ON ed.s = p.node JOIN wd d ON ed.s = d.node GROUP BY 1),
           |p3 AS (SELECT node, 150000 + (85 * sm) // 100 AS pr FROM c3)
           |SELECT node AS term, CAST(pr AS BIGINT) AS pr FROM p3
           |ORDER BY pr DESC, term LIMIT 20""".stripMargin))

  /** Cohen's kappa between the corpus's DECLARED lang tag and the
    * engine's n-gram/lexicon langid (TextAnalysis.cohenKappa) — the
    * annotation-QC statistic: raw agreement flatters a skewed label
    * mix; kappa subtracts the agreement the two columns' margins
    * would produce by chance. One grouping-free scan agg + two
    * label-bounded hash-aggs; κ is one IEEE division of exact longs
    * (round 6), NULL when p_e = 1 (the assortativity degenerate-case
    * rule). The oracle replays the t01 langid CASE and the same
    * integer moments. */
  val t15Kappa = NamedQuery(
    "t15_kappa",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .where(col("text").isNotNull && col("lang").isNotNull)
        .select(col("lang"),
          graft.ops.TextAnalysis.langId(col("text")).as("_detected"))
      graft.ops.TextAnalysis.cohenKappa(docs, "lang", "_detected")
    },
    Some({
      val lex = graft.ops.TextAnalysis.lexicons
      def score(words: Seq[String]) =
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
      val scores = lex.map { case (l, ws) => l -> score(ws) } :+
        ("zh" -> "CAST(length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT)")
      val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
      val caseExpr = scores.foldRight("'unknown'") { case ((l, sc), acc) =>
        s"CASE WHEN $sc > 0 AND $sc = $best THEN '$l' ELSE $acc END"
      }
      s"""WITH d AS (
         |  SELECT lang AS a, $caseExpr AS b
         |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |               CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
         |        FROM d),
         |ma AS (SELECT a AS l, CAST(COUNT(*) AS BIGINT) AS na FROM d GROUP BY 1),
         |mb AS (SELECT b AS l, CAST(COUNT(*) AS BIGINT) AS nb FROM d GROUP BY 1),
         |sj AS (SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS s
         |       FROM ma JOIN mb USING (l))
         |SELECT n AS n_items, agree AS n_agree,
         |       CASE WHEN n * n = s THEN NULL
         |            ELSE round(CAST(n * agree - s AS DOUBLE) /
         |                       CAST(n * n - s AS DOUBLE), 6) END AS kappa
         |FROM tot CROSS JOIN sj""".stripMargin
    }))

  /** Reliability bins of the en-lexicon score against the declared
    * lang = 'en' outcome (TextAnalysis.reliabilityBins) — the
    * calibration table a curation pipeline reads before trusting a
    * classifier score as a keep threshold. Fixed-width integer bins
    * over the observed score range (no float boundary), per-bin mean
    * score in exact micros and positive rate in ppm. One range scan
    * (broadcast 1-row) + one nBins-bounded hash-agg. */
  val t16Calibration = NamedQuery(
    "t16_calibration",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .where(col("text").isNotNull && col("lang").isNotNull)
      graft.ops.TextAnalysis.reliabilityBins(docs,
        graft.ops.TextAnalysis.lexiconScore(col("text"),
          graft.ops.TextAnalysis.lexicons.head._2),
        col("lang") === "en", nBins = 5)
    },
    Some("""WITH d AS (
           |  SELECT CAST(len(list_filter(string_split(text, ' '),
           |              t -> t IN ('the', 'a', 'of', 'and', 'to', 'is'))) AS BIGINT) AS s,
           |         (lang = 'en') AS y
           |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
           |rng AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM d)
           |SELECT CAST((s - lo) * 5 // (hi - lo + 1) AS BIGINT) AS bin,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(SUM(s) * 1000000 // COUNT(*) AS BIGINT) AS mean_score_micros,
           |       CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS pos_ppm
           |FROM d CROSS JOIN rng GROUP BY 1""".stripMargin))

  /** Flesch reading-ease per document (TextAnalysis.readability) —
    * the classic complexity signal for quality bucketing, in exact
    * integer micros (two integer divisions over three regex counts:
    * words, sentence runs floored at 1, vowel runs), plus the
    * conventional difficulty band CASE'd on the same integer. Pure
    * narrow projections — one scan, zero shuffles. */
  val t17Readability = NamedQuery(
    "t17_readability",
    (s, dir) => graft.ops.TextAnalysis.readability(
      Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
           |           WHERE text IS NOT NULL AND doc_id IS NOT NULL),
           |c AS (SELECT doc_id,
           |        CAST(len(string_split(t, ' ')) AS BIGINT) AS words,
           |        greatest(CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT), 1) AS sentences,
           |        CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT) AS vowel_runs
           |      FROM d),
           |f AS (SELECT doc_id, words, sentences, vowel_runs,
           |        206835000 - (1015000 * words) // sentences
           |                  - (84600000 * vowel_runs) // words AS flesch_micro
           |      FROM c WHERE words >= 1)
           |SELECT doc_id, words, sentences, vowel_runs,
           |       CAST(flesch_micro AS BIGINT) AS flesch_micro,
           |       CASE WHEN flesch_micro >= 90000000 THEN 'very_easy'
           |            WHEN flesch_micro >= 60000000 THEN 'standard'
           |            WHEN flesch_micro >= 30000000 THEN 'difficult'
           |            ELSE 'very_difficult' END AS band
           |FROM f""".stripMargin))

  /** Trigram-LM cross-entropy per doc
    * (TextAnalysis.trigramCrossEntropy) — the order-3 upgrade of d28's
    * bigram perplexity filter, with history counts as the trigram
    * table's own margin. Every position's −ln quantizes to integer
    * nanos before the per-doc mean (the d28 ladder), so all three
    * columns are oracle-checked hash-exact. */
  val t18TrigramLm = NamedQuery(
    "t18_trigram_lm",
    (s, dir) => graft.ops.TextAnalysis.trigramCrossEntropy(
      Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 3),
           |b AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
           |             unnest(toks[2:len(toks)-1]) AS w2,
           |             unnest(toks[3:len(toks)]) AS w3 FROM t),
           |c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n_tri
           |       FROM b GROUP BY 1, 2, 3),
           |m AS (SELECT w1, w2, w3, n_tri,
           |             CAST(SUM(n_tri) OVER (PARTITION BY w1, w2) AS BIGINT) AS n_hist
           |      FROM c3),
           |v AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v FROM (
           |        SELECT w1 AS tk FROM c3 UNION SELECT w2 FROM c3
           |        UNION SELECT w3 FROM c3)),
           |n AS (SELECT b.doc_id,
           |             CAST(round(-ln((m.n_tri + 1)
           |                            / CAST(m.n_hist + v.v AS DOUBLE)) * 1e9) AS BIGINT) AS nanos
           |      FROM b JOIN m USING (w1, w2, w3) CROSS JOIN v)
           |SELECT doc_id, COUNT(*) AS n_trigrams,
           |       round(CAST(SUM(nanos) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e9), 6) AS xent3
           |FROM n GROUP BY doc_id""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    t12Bm25, t13TfidfTerms, t14Textrank, t15Kappa, t16Calibration, t17Readability,
    t18TrigramLm,
    q87AnomalyDays, q88Ewma,
    q89RollingRange, q90Streaks, q91ValueFunctions, q92SlidingDistinct,
    q97TrendRegression, q98SlidingDistinctHll)
}
