package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Exact, Tables}
import graft.ops.{AsOfJoin, EventAnalytics, Ranking}

/** The general relational surface (SURVEY.md §2.7): joins (broadcast /
  * shuffled / semi / anti / outer / as-of), window functions, sort+limit
  * top-k, rollup/cube/grouping sets, set ops, scalar subqueries, string &
  * date function families, and the batch analogues of the streaming
  * windows. The reference implements none of these (its only code path is
  * a linear ELT), but the rebuilt engine exposes them as first-class,
  * oracle-checked operators.
  */
object RelationalQueries {

  /** Dim-table joins: both dims are broadcast (no shuffle of the fact). */
  val q10JoinDims = NamedQuery(
    "q10_join_dims",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      cust
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          Exact.centsSum(col("c_acctbal")).as("acctbal_cents"))
    },
    Some("""SELECT r_name, n_name, COUNT(*) AS n_cust,
           |       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name""".stripMargin))

  /** Fact-to-fact equi-join on the shuffle key, revenue in exact cents. */
  val q11JoinFact = NamedQuery(
    "q11_join_fact",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
            .cast("long")).as("revenue_cents"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_items,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY o_orderstatus""".stripMargin))

  /** Left-semi join == EXISTS. */
  val q12SemiJoin = NamedQuery(
    "q12_semi_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      cust.join(o, cust("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"))
    },
    Some("""SELECT c_custkey FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin))

  /** Left-anti join == NOT EXISTS (on a filtered right side so the
    * result is non-trivial: customers with no big-ticket order). */
  val q13AntiJoin = NamedQuery(
    "q13_anti_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).where(col("o_totalprice") > 300000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin))

  /** Left-outer join with per-key counts (COUNT(col) skips the null-extended rows). */
  val q14OuterJoin = NamedQuery(
    "q14_outer_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      cust.join(o, cust("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(Exact.cents(col("o_totalprice"))), lit(0L)).as("spend_cents"))
    },
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           |       CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS spend_cents
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey""".stripMargin))

  /** Window: top-3 orders per customer by (price desc, key) — full
    * tiebreak makes the rank deterministic on both engines. */
  val q15WindowTopk = NamedQuery(
    "q15_window_topk",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           |  FROM orders) WHERE rn <= 3""".stripMargin))

  /** Window: running total per customer in exact cents. */
  val q16WindowRunning = NamedQuery(
    "q16_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(Exact.cents(col("o_totalprice"))).over(w).as("run_cents"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
           |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
           |FROM orders""".stripMargin))

  /** q16's SKEW-RESILIENT twin (Ranking.segmentedRunningSum): the same
    * per-customer running total computed as a two-level prefix sum —
    * within-day running sums on (custkey, day) partitions plus an
    * exclusive per-day offset ladder — so a Zipf-head customer's slice
    * never lands in one sorted task (q16's plain window funnels 1.69×
    * on the 10× skew corpus and grows linearly from there). Registered
    * against q16's UNSEGMENTED oracle: the gate certifies the two
    * plans compute the identical result. */
  val q101RunningSegmented = NamedQuery(
    "q101_running_segmented",
    (s, dir) => {
      Ranking.segmentedRunningSum(Tables.orders(s, dir),
          "o_custkey", "o_orderdate", Seq(col("o_orderkey")),
          Exact.cents(col("o_totalprice")), "run_cents")
        .select(col("o_custkey"), col("o_orderkey"), col("run_cents"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
           |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
           |FROM orders""".stripMargin))

  /** The AUTO front door over q16/q101 (Ranking.runningSumAuto): probes
    * the key's skew via skewReport and dispatches — plain one-exchange
    * window on uniform keys, the segmented two-level prefix sum when
    * the heaviest key would funnel one sorted task. On driver testdata
    * o_custkey is uniform, so THIS query certifies the probe+plain
    * branch against q16's oracle; the SkewCorpus measurement certifies
    * the probe picks the segmented branch on the Zipf corpus (skew
    * table in BASELINE.md). Dispatch never changes results — the
    * salting rule. */
  val q109RunningAuto = NamedQuery(
    "q109_running_auto",
    (s, dir) => {
      Ranking.runningSumAuto(Tables.orders(s, dir),
          "o_custkey", "o_orderdate", Seq(col("o_orderkey")),
          Exact.cents(col("o_totalprice")), "run_cents")
        .select(col("o_custkey"), col("o_orderkey"), col("run_cents"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
           |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
           |FROM orders""".stripMargin))

  /** Global top-k: Spark plans TakeOrderedAndProject (no full sort). */
  val q17Top100 = NamedQuery(
    "q17_top100",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"))
    },
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
           |FROM lineitem
           |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin))

  val q18Rollup = NamedQuery(
    "q18_rollup",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          Exact.centsSum(col("l_quantity")).as("qty_cents"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
           |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin))

  val q19Cube = NamedQuery(
    "q19_cube",
    (s, dir) => {
      Tables.orders(s, dir)
        .cube(year(col("o_orderdate")).cast("long").as("y"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderpriority, COUNT(*) AS n
           |FROM orders GROUP BY CUBE (CAST(year(o_orderdate) AS BIGINT), o_orderpriority)""".stripMargin))

  val q20GroupingSets = NamedQuery(
    "q20_grouping_sets",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin))

  /** Set operations: INTERSECT / EXCEPT (both distinct) tagged into one result. */
  val q21SetOps = NamedQuery(
    "q21_set_ops",
    (s, dir) => {
      val ordered = Tables.orders(s, dir).select(col("o_custkey").as("k"))
      val custs = Tables.customer(s, dir).select(col("c_custkey").as("k"))
      val both = custs.intersect(ordered).withColumn("tag", lit("both"))
      val onlyCust = custs.except(ordered).withColumn("tag", lit("cust_only"))
      both.unionByName(onlyCust).select(col("tag"), col("k"))
    },
    Some("""SELECT 'both' AS tag, k FROM
           |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders)
           |UNION ALL
           |SELECT 'cust_only' AS tag, k FROM
           |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders)""".stripMargin))

  val q22Distinct = NamedQuery(
    "q22_distinct",
    (s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("nk"))
        .distinct()
    },
    Some("SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nk FROM customer"))

  val q23StringFuncs = NamedQuery(
    "q23_string_funcs",
    (s, dir) => {
      Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 5).as("head5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        regexp_replace(col("p_type"), " ", "_").as("rep"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded"),
        reverse(col("p_brand")).as("rev"))
    },
    Some("""SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 5) AS head5,
           |       concat_ws('|', p_brand, p_type) AS cat,
           |       replace(p_type, ' ', '_') AS rep,
           |       CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
           |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           |       reverse(p_brand) AS rev
           |FROM part""".stripMargin))

  val q24DateFuncs = NamedQuery(
    "q24_date_funcs",
    (s, dir) => {
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_format(date_add(to_date(col("o_orderdate")), 7), "yyyy-MM-dd").as("week_later"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          .cast("long").as("days_since"))
    },
    Some("""SELECT o_orderkey,
           |       CAST(year(o_orderdate) AS BIGINT) AS y,
           |       CAST(month(o_orderdate) AS BIGINT) AS m,
           |       CAST(day(o_orderdate) AS BIGINT) AS d,
           |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           |       strftime(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d') AS week_later,
           |       strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
           |       datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days_since
           |FROM orders""".stripMargin))

  val q25CaseMath = NamedQuery(
    "q25_case_math",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_heavy"),
          sum((col("l_orderkey") % 7).cast("long")).as("mod_sum"),
          sum(floor(col("l_quantity") / 7).cast("long")).as("floor_sum"),
          sum(ceil(col("l_quantity") / 7).cast("long")).as("ceil_sum"),
          sum(abs(col("l_orderkey") - 100).cast("long")).as("abs_sum"))
    },
    Some("""SELECT l_returnflag,
           |       CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy,
           |       CAST(SUM(CAST(l_orderkey % 7 AS BIGINT)) AS BIGINT) AS mod_sum,
           |       CAST(SUM(CAST(floor(l_quantity / 7) AS BIGINT)) AS BIGINT) AS floor_sum,
           |       CAST(SUM(CAST(ceil(l_quantity / 7) AS BIGINT)) AS BIGINT) AS ceil_sum,
           |       CAST(SUM(CAST(abs(l_orderkey - 100) AS BIGINT)) AS BIGINT) AS abs_sum
           |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  /** Correlated scalar subquery through the SQL front-end (Catalyst
    * decorrelates it into an aggregate + join). */
  val q26CorrelatedSubq = NamedQuery(
    "q26_correlated_subq",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders_v o
              |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders_v o2
              |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
           |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
           |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin))

  /** As-of join (inclusive backward): each purchase event picks up the
    * latest preceding non-purchase event of the same user. Single shuffle
    * union+window implementation — see graft.ops.AsOfJoin. */
  val q27AsofJoin = NamedQuery(
    "q27_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
      val others = ev.where(col("event_type") =!= "purchase")
      AsOfJoin.backward(purchases, others, key = "user_id", ts = "ts",
          rightPayload = Map("event_id" -> "prior_event_id", "event_type" -> "prior_type"),
          tiebreak = "event_id")
        .select(col("event_id"), col("user_id"), col("prior_event_id"), col("prior_type"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |     o AS (SELECT event_id, user_id, ts, event_type FROM events WHERE event_type <> 'purchase')
           |SELECT p.event_id, p.user_id, o.event_id AS prior_event_id, o.event_type AS prior_type
           |FROM p ASOF LEFT JOIN o ON p.user_id = o.user_id AND p.ts >= o.ts""".stripMargin))

  /** As-of join, FORWARD direction (inclusive): each purchase event
    * picks up the EARLIEST following non-purchase event of the same
    * user — the "next event after" question (next page view after a
    * purchase, next heartbeat after a failure). Same one-shuffle
    * union+window merge scan as q27, partition scan reversed — see
    * graft.ops.AsOfJoin.forward. */
  val q67AsofForward = NamedQuery(
    "q67_asof_forward",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
      val others = ev.where(col("event_type") =!= "purchase")
      AsOfJoin.forward(purchases, others, key = "user_id", ts = "ts",
          rightPayload = Map("event_id" -> "next_event_id", "event_type" -> "next_type"),
          tiebreak = "event_id")
        .select(col("event_id"), col("user_id"), col("next_event_id"), col("next_type"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |     o AS (SELECT event_id, user_id, ts, event_type FROM events WHERE event_type <> 'purchase')
           |SELECT p.event_id, p.user_id, o.event_id AS next_event_id, o.event_type AS next_type
           |FROM p ASOF LEFT JOIN o ON p.user_id = o.user_id AND p.ts <= o.ts""".stripMargin))

  /** As-of join, NEAREST direction (AsOfJoin.nearest) — completes the
    * family (q27 backward / q67 forward): each purchase picks whichever
    * neighbouring non-purchase event of the same user is closer in
    * time, ties preferring backward. Two one-shuffle directional
    * passes stitched on the unique event id; the pick is a per-row
    * CASE over exact micro distances. The oracle runs the honest
    * argmin (row_number over abs distance, backward-first, max-id —
    * the engine's equal-ts carry order). */
  val q114AsofNearest = NamedQuery(
    "q114_asof_nearest",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
      val others = ev.where(col("event_type") =!= "purchase")
      AsOfJoin.nearest(purchases, others, key = "user_id", ts = "ts",
          rightPayload = Map("event_id" -> "near_event_id", "event_type" -> "near_type"),
          tiebreak = "event_id", leftId = "event_id")
        .select(col("event_id"), col("user_id"), col("near_event_id"),
          col("near_type"), col("matched_ts").as("near_ts"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id AS c_id, event_type AS c_type, user_id, ts AS c_ts
           |      FROM events WHERE event_type <> 'purchase'),
           |j AS (SELECT p.event_id, p.user_id, c.c_id, c.c_type, c.c_ts,
           |        row_number() OVER (PARTITION BY p.event_id
           |          ORDER BY abs(epoch_us(p.ts) - epoch_us(c.c_ts)),
           |                   (c.c_ts > p.ts), c.c_id DESC) AS rn
           |      FROM p LEFT JOIN c ON p.user_id = c.user_id)
           |SELECT event_id, user_id, c_id AS near_event_id, c_type AS near_type,
           |       c_ts AS near_ts
           |FROM j WHERE rn = 1""".stripMargin))

  /** Forward fill / LOCF (ops/EventAnalytics.forwardFill): a
    * deterministic third of event values is blanked, then repaired with
    * the latest preceding observation per user — the sensor-dropout
    * repair every telemetry pipeline runs. One window over one
    * exchange on user_id; leading nulls stay null. Oracle: DuckDB's
    * last_value IGNORE NULLS over the identical frame. */
  val q69ForwardFill = NamedQuery(
    "q69_forward_fill",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_id") % 3 =!= 0,
            Exact.cents(col("value"))).as("cents_sparse"))
      EventAnalytics.forwardFill(ev,
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("cents_sparse"), as = "cents_filled")
        .select(col("event_id"), col("user_id"),
          col("cents_sparse"), col("cents_filled"))
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, ts,
           |         CASE WHEN event_id % 3 <> 0
           |              THEN CAST(round(value * 100) AS BIGINT) END AS cents_sparse
           |  FROM events)
           |SELECT event_id, user_id, cents_sparse,
           |       last_value(cents_sparse IGNORE NULLS) OVER (
           |         PARTITION BY user_id ORDER BY ts, event_id
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled
           |FROM e""".stripMargin))

  /** Tumbling time window (batch analogue of the streaming agg). */
  val q28Tumbling = NamedQuery(
    "q28_tumbling_window",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.centsSum(col("value")).as("value_cents"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("value_cents"))
    },
    Some("""SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
           |FROM events GROUP BY 1, 2""".stripMargin))

  /** Session windows (30-min gap) in batch; oracle mirrors Spark's
    * session semantics: touching windows MERGE — an event at exactly
    * last + gap still extends the session, so a new session starts
    * only on a STRICTLY greater gap (proven against the streaming
    * session_window in StreamOpsSpec's exact-gap-edge test; the
    * original `>=` oracle passed only because microsecond event
    * streams make exact 30-minute gaps measure-zero). Session end =
    * last event + gap. */
  val q29Sessionize = NamedQuery(
    "q29_sessionize",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
    },
    Some("""WITH g AS (
           |  SELECT user_id, ts, event_id,
           |         CASE WHEN lag(ts) OVER w IS NULL
           |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
           |              THEN 1 ELSE 0 END AS new_s
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |     sess AS (
           |  SELECT user_id, ts,
           |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                          ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM g)
           |SELECT user_id, MIN(ts) AS session_start,
           |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           |       COUNT(*) AS n_events
           |FROM sess GROUP BY user_id, sid""".stripMargin))

  /** Window navigation family: lag/lead, partition first, ntile,
    * percent_rank, cume_dist. The order (o_orderdate, o_orderkey) is
    * total, so every function is deterministic; percent_rank/cume_dist
    * are single IEEE divisions of integers — bit-identical across
    * engines. */
  val q40WindowNav = NamedQuery(
    "q40_window_nav",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first(col("o_orderkey")).over(w).as("first_key"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |       lag(o_orderkey, 1) OVER w AS prev_key,
           |       lead(o_orderkey, 1) OVER w AS next_key,
           |       first_value(o_orderkey) OVER w AS first_key,
           |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           |       percent_rank() OVER w AS pct_rank,
           |       cume_dist() OVER w AS cume
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin))

  /** Collection aggregate: collect_list sorted to a canonical order
    * (aggregation order is nondeterministic on both engines — sorting is
    * what makes the result well-defined), emitted as a joined string so
    * the comparison stays scalar. */
  val q41ArrayAgg = NamedQuery(
    "q41_array_agg",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          concat_ws(",", sort_array(collect_list(col("l_linenumber").cast("long"))))
            .as("lines"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT l_orderkey,
           |       array_to_string(list_sort(list(CAST(l_linenumber AS BIGINT))), ',') AS lines,
           |       COUNT(*) AS n_lines
           |FROM lineitem GROUP BY l_orderkey""".stripMargin))

  /** Multiple DISTINCT aggregates in one pass — Catalyst plans the
    * Expand-based rewrite (one shuffle, grouping-id lanes) instead of
    * per-distinct subqueries. */
  val q42MultiDistinct = NamedQuery(
    "q42_multi_distinct",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(year(col("o_orderdate")).cast("long")).as("n_years"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT o_orderpriority,
           |       COUNT(DISTINCT o_custkey) AS n_cust,
           |       COUNT(DISTINCT CAST(year(o_orderdate) AS BIGINT)) AS n_years,
           |       COUNT(*) AS n
           |FROM orders GROUP BY o_orderpriority""".stripMargin))

  /** Null-key grouping semantics: NULL is a real group (Spark and ANSI
    * SQL agree; pandas would drop it — the documented C-family semantic
    * decision), and count(col) skips nulls while count(*) does not. */
  val q43NullGroup = NamedQuery(
    "q43_null_group",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("k_raw", expr("get_json_object(props, '$.k')"))
        .groupBy(col("k_raw"))
        .agg(count(lit(1)).as("n"), count(col("k_raw")).as("n_nonnull"))
    },
    Some("""SELECT json_extract_string(props, '$.k') AS k_raw,
           |       COUNT(*) AS n,
           |       COUNT(json_extract_string(props, '$.k')) AS n_nonnull
           |FROM events GROUP BY 1""".stripMargin))

  /** RANGE window frame (value-based, not row-based): trailing 30-day
    * revenue per customer. A distinct window execution path from
    * q16/q40's ROWS frames — frame bounds move by ORDER-BY VALUE, so
    * same-day orders are peers and enter the frame together, making the
    * sum deterministic without a total order. Integer day + cents keep
    * it hash-exact. */
  val q46RangeFrame = NamedQuery(
    "q46_range_frame",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-30, 0)
      Tables.orders(s, dir)
        .withColumn("day",
          datediff(col("o_orderdate").cast("date"), lit("1990-01-01").cast("date")).cast("long"))
        .select(col("o_orderkey"), col("o_custkey"), col("day"),
          sum(Exact.cents(col("o_totalprice"))).over(w).as("cents_30d"))
    },
    Some("""SELECT o_orderkey, o_custkey,
           |       CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           |         PARTITION BY o_custkey
           |         ORDER BY CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
           |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_30d
           |FROM orders""".stripMargin))

  /** Time-series resample with gap fill (the "date spine" primitive):
    * hourly event counts per type INCLUDING empty hours. The spine is
    * generated from a 1-row bounds aggregate × the tiny type dim
    * (sequence + explode — broadcast-sized by construction); the fact
    * side collapses to (type, hour) partials before the left join, so
    * nothing here scales with raw event volume except the one
    * pre-aggregation. 215 of 3600 output rows at sf0.01 are genuinely
    * gap-filled zeros. */
  val q47DateSpine = NamedQuery(
    "q47_date_spine",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("hr", date_trunc("hour", col("ts")))
      val counts = ev.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), Exact.centsSum(col("value")).as("value_cents"))
      val bounds = ev.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      val spine = bounds.crossJoin(ev.select(col("event_type")).distinct())
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr"))
      spine.join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("value_cents"), lit(0L)).as("value_cents"))
    },
    Some("""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS hr, value FROM events),
           |b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM e),
           |ty AS (SELECT DISTINCT event_type FROM e),
           |spine AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
           |          FROM b, ty),
           |c AS (SELECT event_type, hr, COUNT(*) AS n,
           |             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
           |      FROM e GROUP BY 1, 2)
           |SELECT s.event_type, strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hr,
           |       COALESCE(c.n, 0) AS n, COALESCE(c.value_cents, 0) AS value_cents
           |FROM spine s LEFT JOIN c USING (event_type, hr)""".stripMargin))

  /** NOT IN with a subquery — ANSI three-valued logic (one NULL in the
    * subquery would empty the result). On this data Catalyst PROVES both
    * sides non-nullable from the parquet schema and degrades the
    * null-aware anti join to a plain BroadcastHashJoin LeftAnti (verified
    * in the plan) — the optimizer behavior this query pins: the engine
    * pays the null-tracking cost only when nullability is real. Both
    * engines implement the ANSI semantics; the aggregate keeps the
    * checked output small. */
  val q48NullAwareAnti = NamedQuery(
    "q48_null_aware_anti",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_naa")
      Tables.customer(s, dir).createOrReplaceTempView("customer_naa")
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
              |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
              |FROM orders_naa
              |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer_naa
              |                        WHERE c_mktsegment = 'MACHINERY')
              |GROUP BY o_orderpriority""".stripMargin)
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
           |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
           |FROM orders
           |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
           |                        WHERE c_mktsegment = 'MACHINERY')
           |GROUP BY o_orderpriority""".stripMargin))

  /** Linear interpolation between observations
    * (EventAnalytics.linearInterpolate) — q69's forward-fill completed
    * into gap REPAIR: every event row gets the value interpolated
    * between its user's surrounding 'view' observations as the exact
    * integer weighted average (v_b·(t_f−t) + v_f·(t−t_b)) div
    * (t_f−t_b) — all terms non-negative so floor division agrees
    * across engines; edge rows take the nearest observation, known
    * rows return themselves exactly. One exchange on user_id, two
    * frames over it, no joins — the time-series repair plan a 100 TB
    * telemetry pipeline wants (the as-of-join formulation costs two
    * extra shuffles). */
  val q121LinearInterp = NamedQuery(
    "q121_linear_interp",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "view", Exact.cents(col("value")))
          .as("cents_known"))
      EventAnalytics.linearInterpolate(ev,
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          Tables.tsMicros(col("ts")), col("cents_known"), as = "interp_cents")
        .select(col("event_id"), col("user_id"), col("cents_known"),
          col("interp_cents"))
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, epoch_us(ts) AS t, ts,
           |         CASE WHEN event_type = 'view'
           |              THEN CAST(round(value * 100) AS BIGINT) END AS cents_known
           |  FROM events),
           |w AS (SELECT event_id, user_id, t, cents_known,
           |        last_value(CASE WHEN cents_known IS NOT NULL THEN t END IGNORE NULLS)
           |          OVER wb AS tb,
           |        last_value(cents_known IGNORE NULLS) OVER wb AS vb,
           |        first_value(CASE WHEN cents_known IS NOT NULL THEN t END IGNORE NULLS)
           |          OVER wf AS tf,
           |        first_value(cents_known IGNORE NULLS) OVER wf AS vf
           |      FROM e
           |      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |             wf AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           |SELECT event_id, user_id, cents_known,
           |       CAST(CASE WHEN tb IS NULL AND tf IS NULL THEN NULL
           |                 WHEN tb IS NULL THEN vf
           |                 WHEN tf IS NULL THEN vb
           |                 WHEN tf = tb THEN vb
           |                 ELSE (vb * (tf - t) + vf * (t - tb)) // (tf - tb)
           |            END AS BIGINT) AS interp_cents
           |FROM w""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q121LinearInterp,
    q10JoinDims, q11JoinFact, q12SemiJoin, q13AntiJoin, q14OuterJoin,
    q15WindowTopk, q16WindowRunning, q101RunningSegmented, q109RunningAuto,
    q17Top100, q18Rollup, q19Cube,
    q20GroupingSets, q21SetOps, q22Distinct, q23StringFuncs, q24DateFuncs,
    q25CaseMath, q26CorrelatedSubq, q27AsofJoin, q28Tumbling, q29Sessionize,
    q40WindowNav, q41ArrayAgg, q42MultiDistinct, q43NullGroup, q46RangeFrame,
    q47DateSpine, q48NullAwareAnti, q67AsofForward, q69ForwardFill,
    q114AsofNearest)
}
