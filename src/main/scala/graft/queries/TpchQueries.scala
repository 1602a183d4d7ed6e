package graft.queries

import graft.{Exact, Tables}
import org.apache.spark.sql.functions._

/** TPC-H completion batch (round 7): the canonical decision-support
  * shapes not yet in the inventory — aggregation-heavy (Q1, Q6),
  * multi-dim join topologies (Q7, Q8), outer-join distribution (Q13),
  * view+max (Q15), decorrelated scalar predicate (Q17), OR-of-ANDs
  * pushdown (Q19), and anti-join reporting (Q22). Q3/Q5/Q10/Q14/Q18
  * live in ExtendedQueries (q38/q39/q73/q75/q56).
  *
  * Adaptations to the driver corpus, documented per query: the corpus
  * (TESTDATA.md) carries no l_shipmode / l_commitdate / l_receiptdate /
  * partsupp / c_phone, so Q4, Q12, Q20, Q21 have no faithful analog and
  * Q13's comment filter / Q22's phone-prefix become priority / nation
  * keys. Everything else keeps the reference query's join topology and
  * predicate structure.
  *
  * Determinism contract (NamedQuery scaladoc): money in exact integer
  * cents, counts as longs, every cross-engine float comparison replaced
  * by integer cross-multiplication, ratios emitted as single IEEE
  * divisions of identical exact integers.
  */
object TpchQueries {

  private def discCents = // l_extendedprice * (1 - l_discount), exact cents
    Exact.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  /** TPC-H Q1 (pricing summary report): the canonical "is partial
    * aggregation working" query — 8 aggregates over ~6 groups; at 100 TB
    * the map-side combine reduces ~all input before the 6-row exchange.
    * The shipdate cutoff is pushed to the scan as a HALF-OPEN bound
    * (< next midnight): the classic <= DATE form compares a timestamp
    * against midnight in Spark but a truncated date in SQL, so an
    * intraday boundary-day row would diverge (the repo's date-filter
    * rule — every other date filter here is half-open too). Averages
    * are single IEEE division chains over exact integer sums
    * (identical ops both engines); qty is integral in the corpus so it
    * sums as a long directly (round() guards a regenerated corpus with
    * .5 values). */
  val q78Tpch1 = NamedQuery(
    "q78_tpch1",
    (s, dir) => {
      val qtyL = round(col("l_quantity"), 0).cast("long")
      val chargeCents = Exact.cents(col("l_extendedprice") *
        (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") < "2000-09-03")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qtyL).as("sum_qty"),
          sum(Exact.cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(discCents).as("sum_disc_cents"),
          sum(chargeCents).as("sum_charge_cents"),
          sum(Exact.cents(col("l_discount"))).as("sum_disc_pts"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_cents"), col("sum_disc_cents"),
          col("sum_charge_cents"),
          (col("sum_qty").cast("double") / col("count_order")).as("avg_qty"),
          (col("sum_base_cents").cast("double") / col("count_order") / 100).as("avg_price"),
          (col("sum_disc_pts").cast("double") / col("count_order") / 100).as("avg_disc"),
          col("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
           |       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
           |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100 AS avg_price,
           |       CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100 AS avg_disc,
           |       CAST(COUNT(*) AS BIGINT) AS count_order
           |FROM lineitem
           |WHERE CAST(l_shipdate AS DATE) < DATE '2000-09-03'
           |GROUP BY 1, 2""".stripMargin))

  /** TPC-H Q6 (forecast revenue change): pure filter+agg — the pushdown
    * benchmark. All three predicates must reach the parquet scan
    * (plan-pinned), the scan reads 4 columns, and the "aggregate" is a
    * one-row reduce: at 100 TB this query is I/O-bound by min/max
    * rowgroup pruning on shipdate, nothing else. Discount literals
    * compare exactly: the stored values and the literals are the same
    * parsed doubles on both engines. */
  val q79Tpch6 = NamedQuery(
    "q79_tpch6",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 && col("l_quantity") < 24)
        .agg(
          sum(Exact.cents(col("l_extendedprice") * col("l_discount")))
            .as("revenue_cents"),
          count(lit(1)).as("n_lines")),
    Some("""SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           |       CAST(COUNT(*) AS BIGINT) AS n_lines
           |FROM lineitem
           |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           |  AND l_discount BETWEEN 0.02 AND 0.04
           |  AND l_quantity < 24""".stripMargin))

  /** TPC-H Q7 (volume shipping): bilateral trade between two nations by
    * year. The scale shape: supplier and customer are pre-filtered to
    * the two nations and carry their nation NAME before the fact joins,
    * so both broadcast (tiny after the filter) and the only shuffle is
    * lineitem ⋈ orders. The either-direction predicate sits on the
    * joined frame — it needs both sides' nations. */
  val q80Tpch7 = NamedQuery(
    "q80_tpch7",
    (s, dir) => {
      val nat = Tables.nation(s, dir)
        .where(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(discCents).as("revenue_cents"))
    },
    Some("""SELECT supp_nation, cust_nation, l_year,
           |       CAST(SUM(cents) AS BIGINT) AS revenue_cents
           |FROM (
           |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |         CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
           |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS cents
           |  FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
           |                JOIN supplier ON l_suppkey = s_suppkey
           |                JOIN customer ON o_custkey = c_custkey
           |                JOIN nation sn ON s_nationkey = sn.n_nationkey
           |                JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           |     OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
           |GROUP BY 1, 2, 3""".stripMargin))

  /** TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    * revenue sold to EUROPE customers, by order year. Five dims — part
    * (type-filtered), supplier+nation (share flag), customer+nation+
    * region (market filter) — ALL broadcast after their filters; the
    * fact-fact lineitem ⋈ orders join is the only shuffle. The share is
    * conditional aggregation in one pass (q75's rule: never two scans),
    * emitted as exact cents plus one IEEE division. */
  val q81Tpch8 = NamedQuery(
    "q81_tpch8",
    (s, dir) => {
      val part = Tables.part(s, dir).where(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val supN = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val euroNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(euroNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(supN), li("l_suppkey") === supN("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", discCents).otherwise(0L))
            .as("nation_cents"),
          sum(discCents).as("total_cents"))
        .withColumn("mkt_share",
          col("nation_cents").cast("double") / col("total_cents"))
    },
    Some("""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
           |       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
           |                     THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           |                     ELSE 0 END) AS BIGINT) AS nation_cents,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           |       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
           |                     THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           |                     ELSE 0 END) AS DOUBLE)
           |         / SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS mkt_share
           |FROM lineitem JOIN part     ON l_partkey = p_partkey
           |              JOIN orders   ON l_orderkey = o_orderkey
           |              JOIN customer ON o_custkey = c_custkey
           |              JOIN supplier ON l_suppkey = s_suppkey
           |              JOIN nation sn ON s_nationkey = sn.n_nationkey
           |              JOIN nation cn ON c_nationkey = cn.n_nationkey
           |              JOIN region    ON cn.n_regionkey = r_regionkey
           |WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
           |GROUP BY 1""".stripMargin))

  /** TPC-H Q13 (customer order-count distribution): how many customers
    * placed k orders. LEFT join so zero-order customers land in the
    * k=0 bucket (count(o_orderkey) counts matches only — the outer-join
    * null row counts as 0, exactly the reference semantics); the
    * priority filter stands in for the reference's comment NOT LIKE
    * (no comment column in the corpus) and must sit in the join's right
    * INPUT, not the WHERE (a WHERE would turn the outer join inner).
    * Two hash-aggs; the distribution agg runs over ≤ #customers rows. */
  val q82Tpch13 = NamedQuery(
    "q82_tpch13",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
        .where(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey"), col("o_orderkey"))
      Tables.customer(s, dir)
        .join(ord, col("c_custkey") === ord("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
           |FROM (
           |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
           |  FROM customer LEFT JOIN (
           |    SELECT o_custkey, o_orderkey FROM orders
           |    WHERE o_orderpriority <> '4-NOT SPECIFIED') o
           |  ON c_custkey = o_custkey
           |  GROUP BY c_custkey)
           |GROUP BY c_count""".stripMargin))

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    * max. The reference's CREATE VIEW + scalar max re-expressed as the
    * repo's broadcast one-row pattern: the per-supplier agg computes
    * once, its max crossJoins back as a single broadcast row, and the
    * equality filter runs on exact cents (ties all surface, like the
    * reference). Supplier (dim) broadcasts for the name. The naive form
    * recomputes the view for the subquery — here the agg subtree is one
    * plan, reused by ReusedExchange. The explicit suppkey null filter
    * is load-bearing for that reuse: without it the suppkey JOIN infers
    * isnotnull on one branch only, the two agg subtrees stop being
    * canonical twins, and lineitem scans twice (plan-pinned). */
  val q83Tpch15 = NamedQuery(
    "q83_tpch15",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01" &&
          col("l_suppkey").isNotNull)
        .groupBy(col("l_suppkey"))
        .agg(sum(discCents).as("total_revenue_cents"))
      val top = rev.agg(max(col("total_revenue_cents")).as("max_revenue_cents"))
      rev.crossJoin(broadcast(top))
        .where(col("total_revenue_cents") === col("max_revenue_cents"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
    },
    Some("""WITH revenue AS (
           |  SELECT l_suppkey,
           |         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_cents
           |  FROM lineitem
           |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
           |    AND l_suppkey IS NOT NULL
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue_cents
           |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
           |WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM revenue)""".stripMargin))

  /** TPC-H Q17 (small-quantity-order revenue): revenue lost if orders
    * below 20% of a part's average quantity stopped shipping, for one
    * brand. The reference's correlated scalar subquery (avg per part)
    * decorrelates into a window over l_partkey — ONE scan, one shuffle
    * (vs the textbook agg + self-join's two lineitem passes; the
    * decorrelated-join form of scalar subqueries is exercised by
    * q36/q48). The threshold compare qty < 0.2·avg runs as integer
    * cross-multiplication 5·n·qty < sum_qty — no float boundary (the
    * ADVICE d32 rule). avg_yearly spans the corpus' 7 order years. */
  val q84Tpch17 = NamedQuery(
    "q84_tpch17",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      val qtyL = round(col("l_quantity"), 0).cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).where(col("p_brand") === "Brand#4")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), qtyL.as("qty"), Exact.cents(col("l_extendedprice")).as("price_cents"))
        .withColumn("n_part", count(lit(1)).over(w))
        .withColumn("sum_qty_part", sum(col("qty")).over(w))
        .where(col("qty") * 5 * col("n_part") < col("sum_qty_part"))
        .agg(sum(col("price_cents")).as("total_cents"),
          count(lit(1)).as("n_small"))
        .withColumn("avg_yearly", col("total_cents").cast("double") / 7 / 100)
    },
    Some("""WITH li AS (
           |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
           |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
           |         CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n_part,
           |         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty_part
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE p_brand = 'Brand#4')
           |SELECT CAST(SUM(price_cents) AS BIGINT) AS total_cents,
           |       CAST(COUNT(*) AS BIGINT) AS n_small,
           |       CAST(SUM(price_cents) AS DOUBLE) / 7 / 100 AS avg_yearly
           |FROM li WHERE qty * 5 * n_part < sum_qty_part""".stripMargin))

  /** TPC-H Q19 (discounted revenue, OR-of-ANDs): three (brand, size,
    * quantity) disjuncts over lineitem ⋈ part. The optimizer test:
    * the common factor of the disjunction (qty ≤ 40, size ≥ 1) is
    * extractable and the part side is a broadcast; the disjuncts that
    * mix both sides' columns evaluate post-join. Revenue in exact
    * cents; one output row. */
  val q85Tpch19 = NamedQuery(
    "q85_tpch19",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .where(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 25) &&
            col("l_quantity").between(20, 40)))
        .agg(sum(discCents).as("revenue_cents"), count(lit(1)).as("n_lines"))
    },
    Some("""SELECT CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           |       CAST(COUNT(*) AS BIGINT) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
           |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30)
           |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 40)""".stripMargin))

  /** TPC-H Q22 (global sales opportunity): wealthy customers (balance
    * above the positive-balance average) with no RECENT order, by
    * nation (the corpus has no phone column, so nationkey stands in
    * for the reference's country code; and every sf0.01 customer has
    * SOME order, so the anti-join side is date-filtered — "lapsed since
    * 1999" — to keep the query non-vacuous at every SF). Three pieces,
    * each the repo's standard scale shape: the average as a broadcast
    * one-row agg, the above-average test as integer cross-multiplication
    * bal_cents·n > sum_cents (no float boundary), and the "no recent
    * order" as a LEFT ANTI join — a hash shuffle on custkey, never a
    * correlated NOT EXISTS per row. */
  val q86Tpch22 = NamedQuery(
    "q86_tpch22",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"),
          Exact.cents(col("c_acctbal")).as("bal_cents"))
      val avgPos = cust.where(col("bal_cents") > 0)
        .agg(sum(col("bal_cents")).as("sum_pos_cents"), count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(avgPos))
        .where(col("bal_cents") * col("n_pos") > col("sum_pos_cents"))
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= "1999-01-01").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("total_bal_cents"))
    },
    Some("""WITH cust AS (
           |  SELECT c_custkey, c_nationkey,
           |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
           |  FROM customer),
           |avg_pos AS (
           |  SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_pos_cents,
           |         CAST(COUNT(*) AS BIGINT) AS n_pos
           |  FROM cust WHERE bal_cents > 0)
           |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           |       CAST(COUNT(*) AS BIGINT) AS numcust,
           |       CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
           |FROM cust, avg_pos
           |WHERE bal_cents * n_pos > sum_pos_cents
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey
           |                    AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')
           |GROUP BY 1""".stripMargin))

  /** TPC-H Q4 (order priority checking): orders with at least one LATE
    * line, counted by priority. The corpus has no commit/receipt dates,
    * so "late" adapts to shipped > 90 days after the order date —
    * preserving Q4's defining shape: an EXISTS that must plan as a
    * LEFT SEMI join (each order counted ONCE however many late lines
    * it has), with a mixed equi + cross-side range predicate. The year
    * filter is pushed to the orders scan; the semi join's equi key
    * carries the shuffle. */
  val q93Tpch4 = NamedQuery(
    "q93_tpch4",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
        .where(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1998-01-01")
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
           |FROM orders
           |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
           |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey
           |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
           |GROUP BY 1""".stripMargin))

  /** TPC-H Q2 (minimum-cost supplier): for each size-25 part, the
    * EUROPE supplier offering it cheapest. No partsupp table in the
    * corpus, so the (part, supplier, cost) relation derives from
    * lineitem with cost = the line's extended price in cents
    * (documented proxy). The correlated min-cost subquery decorrelates
    * into ONE struct-min hash-agg (the q52 argmax pattern — never the
    * textbook re-join): min(struct(cost, suppkey, name)) picks the
    * cheapest offer with the supplier id as the deterministic
    * tie-break. Part and the region-filtered supplier both broadcast;
    * the only data shuffle is the per-part aggregate. */
  val q94Tpch2 = NamedQuery(
    "q94_tpch2",
    (s, dir) => {
      val part = Tables.part(s, dir).where(col("p_size") === 25)
        .select(col("p_partkey"))
      val euroSup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      Tables.lineitem(s, dir)
        .join(broadcast(part), col("l_partkey") === part("p_partkey"))
        .join(broadcast(euroSup), col("l_suppkey") === euroSup("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(min(struct(
          Exact.cents(col("l_extendedprice")).as("cost_cents"),
          col("s_suppkey"), col("s_name"))).as("_best"))
        .select(col("l_partkey"),
          col("_best.cost_cents").as("min_cost_cents"),
          col("_best.s_suppkey").as("s_suppkey"),
          col("_best.s_name").as("s_name"))
    },
    Some("""WITH offers AS (
           |  SELECT l_partkey,
           |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cost_cents,
           |         s_suppkey, s_name,
           |         row_number() OVER (PARTITION BY l_partkey
           |           ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT), s_suppkey) AS rn
           |  FROM lineitem
           |    JOIN part ON l_partkey = p_partkey
           |    JOIN supplier ON l_suppkey = s_suppkey
           |    JOIN nation ON s_nationkey = n_nationkey
           |    JOIN region ON n_regionkey = r_regionkey
           |  WHERE p_size = 25 AND r_name = 'EUROPE')
           |SELECT l_partkey, cost_cents AS min_cost_cents, s_suppkey, s_name
           |FROM offers WHERE rn = 1""".stripMargin))

  /** TPC-H Q9 (product-type profit by nation and year): profit =
    * revenue − cost for STANDARD parts, by supplier nation × order
    * year. The corpus has no ps_supplycost; cost adapts to
    * 60% · p_retailprice · quantity (documented proxy — the shape is
    * what matters: a 5-table join where every dim broadcasts, the
    * fact-fact lineitem ⋈ orders pair carries the only big shuffle,
    * and the per-line profit must round to cents ONCE per line, not
    * per term, so both engines subtract identical doubles before the
    * one quantization). */
  val q95Tpch9 = NamedQuery(
    "q95_tpch9",
    (s, dir) => {
      val part = Tables.part(s, dir).where(col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_retailprice"))
      val supN = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
      val profitCents = Exact.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity"))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(broadcast(supN), li("l_suppkey") === supN("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(profitCents).as("profit_cents"))
    },
    Some("""SELECT n_name AS nation,
           |       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
           |       CAST(SUM(CAST(round((l_extendedprice * (1.0 - l_discount)
           |                            - 0.6 * p_retailprice * l_quantity) * 100) AS BIGINT)) AS BIGINT) AS profit_cents
           |FROM lineitem
           |  JOIN part ON l_partkey = p_partkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation ON s_nationkey = n_nationkey
           |  JOIN orders ON l_orderkey = o_orderkey
           |WHERE p_type = 'STANDARD'
           |GROUP BY 1, 2""".stripMargin))

  /** TPC-H Q16 (parts/supplier relationship): how many distinct
    * suppliers offer each (brand, type, size) bucket, excluding one
    * brand and excluding negative-balance suppliers (the corpus'
    * stand-in for Q16's complaint filter — no comment column). The
    * partsupp relation derives as DISTINCT (part, supplier) pairs from
    * lineitem — deduped FIRST so the distinct-supplier count never
    * re-scans raw lines; part broadcasts; the excluded suppliers
    * arrive as a broadcast ANTI join (never NOT IN's null-trap
    * semantics) — and the ORACLE uses NOT EXISTS for the same reason:
    * a NOT IN over a set containing one NULL suppkey would empty the
    * DuckDB side while the anti join keeps rows (the align-the-NULL-
    * edge rule applies to both engines). Top-20 buckets by supplier
    * count plans as TakeOrderedAndProject. */
  val q96Tpch16 = NamedQuery(
    "q96_tpch16",
    (s, dir) => {
      val pairs = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val part = Tables.part(s, dir).where(col("p_brand") =!= "Brand#5")
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSup = Tables.supplier(s, dir).where(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      pairs
        .join(broadcast(part), col("l_partkey") === part("p_partkey"))
        .join(broadcast(badSup), col("l_suppkey") === badSup("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
        .limit(20)
    },
    Some("""WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
           |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           |FROM pairs JOIN part ON l_partkey = p_partkey
           |WHERE p_brand <> 'Brand#5'
           |  AND NOT EXISTS (SELECT 1 FROM supplier
           |                  WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
           |GROUP BY 1, 2, 3
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q78Tpch1, q79Tpch6, q80Tpch7, q81Tpch8, q82Tpch13,
    q83Tpch15, q84Tpch17, q85Tpch19, q86Tpch22,
    q93Tpch4, q94Tpch2, q95Tpch9, q96Tpch16)
}
