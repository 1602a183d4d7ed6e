package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Exact, Tables}
import graft.ops.SkewJoin

/** Second wave of engine-capability queries: range (non-equi) join,
  * pivot, exact percentiles, salted skew join, array explode/unnest,
  * bag union, uncorrelated scalar subqueries, and approximate sketches
  * (rows-only — estimates are engine-specific by construction).
  */
object ExtendedQueries {

  /** Non-equi range join: each lineitem lands in a price band; the band
    * dim is tiny → Spark broadcasts and the scan stays shuffle-free up
    * to the final small aggregate. */
  val q30RangeJoin = NamedQuery(
    "q30_range_join",
    (s, dir) => {
      val bands = broadcast(s.range(0, 12).select(
        col("id").as("band"),
        (col("id") * 10000).cast("double").as("lo"),
        ((col("id") + 1) * 10000).cast("double").as("hi")))
      val li = Tables.lineitem(s, dir)
      li.join(bands,
          li("l_extendedprice") >= bands("lo") && li("l_extendedprice") < bands("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), Exact.centsSum(col("l_extendedprice")).as("price_cents"))
    },
    Some("""SELECT b.band, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
           |FROM lineitem
           |JOIN (SELECT g AS band, g * 10000.0 AS lo, (g + 1) * 10000.0 AS hi
           |      FROM generate_series(0, 11) t(g)) b
           |  ON l_extendedprice >= b.lo AND l_extendedprice < b.hi
           |GROUP BY b.band""".stripMargin))

  /** Pivot with an explicit value list (no extra distinct-values job —
    * the list IS the contract, which is also what keeps the plan static
    * at scale). */
  val q31Pivot = NamedQuery(
    "q31_pivot",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(Exact.centsSum(col("l_quantity")))
        .na.fill(0L, Seq("A", "N", "R"))
    },
    Some("""SELECT l_linestatus,
           |       CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(round(l_quantity * 100) AS BIGINT) END), 0) AS BIGINT) AS A,
           |       CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(round(l_quantity * 100) AS BIGINT) END), 0) AS BIGINT) AS N,
           |       CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(round(l_quantity * 100) AS BIGINT) END), 0) AS BIGINT) AS R
           |FROM lineitem GROUP BY l_linestatus""".stripMargin))

  /** Exact percentiles. Spark's percentile and DuckDB's quantile_cont
    * share the (n-1)*p linear-interpolation definition; p ∈ {.25,.5,.75}
    * are exact binary fractions, so interpolation over integer cents is
    * FP-exact on both engines. */
  val q32Percentiles = NamedQuery(
    "q32_percentiles",
    (s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), Exact.cents(col("o_totalprice")).as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(cents, 0.25)").as("p25"),
          expr("percentile(cents, 0.5)").as("p50"),
          expr("percentile(cents, 0.75)").as("p75"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT o_orderpriority,
           |       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) AS p25,
           |       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS p50,
           |       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75) AS p75,
           |       COUNT(*) AS n
           |FROM orders GROUP BY o_orderpriority""".stripMargin))

  /** Salted skew join: result must equal the plain join (the oracle IS
    * the unsalted formulation) while the physical plan spreads each
    * suppkey over 4 salt buckets. */
  val q33SaltedJoin = NamedQuery(
    "q33_salted_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir).select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      SkewJoin.saltedInner(li, sup, key = "l_suppkey", factor = 4,
          saltSource = Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"), Exact.centsSum(col("l_quantity")).as("qty_cents"))
    },
    Some("""SELECT s_name, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
           |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |GROUP BY s_name""".stripMargin))

  /** q33's AUTO-dialed twin (SkewJoin.saltedInnerAuto): the salt factor
    * comes from skewReport's suggested_salt for the heaviest key
    * instead of a fixed 4 — on uniform data it probes to 1 (the plain
    * join, no explode), on the 40%-head skew corpus it probes to the
    * factor that levels the hub onto mean-sized reducers. Same oracle
    * as q33: salting must never change the result, only the partition
    * profile. */
  val q102SaltedAuto = NamedQuery(
    "q102_salted_auto",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir).select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      SkewJoin.saltedInnerAuto(li, sup, key = "l_suppkey",
          saltSource = Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"), Exact.centsSum(col("l_quantity")).as("qty_cents"))
    },
    Some("""SELECT s_name, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
           |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |GROUP BY s_name""".stripMargin))

  /** Array explode / unnest: token frequencies over documents (the
    * generic flatten primitive every text pipeline leans on). */
  val q34Explode = NamedQuery(
    "q34_explode",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 10)
    },
    Some("""SELECT token, COUNT(*) AS n
           |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
           |GROUP BY token HAVING COUNT(*) >= 10""".stripMargin))

  /** U1 — bag union (the reference's page concatenation, main.py:114-120)
    * made explicit across two differently-sourced key sets. */
  val q35UnionAll = NamedQuery(
    "q35_union_all",
    (s, dir) => {
      val a = Tables.orders(s, dir).select(col("o_custkey").as("k")).withColumn("src", lit("o"))
      val b = Tables.customer(s, dir).select(col("c_custkey").as("k")).withColumn("src", lit("c"))
      a.unionByName(b).groupBy(col("src")).agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
    },
    Some("""SELECT src, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum FROM (
           |  SELECT o_custkey AS k, 'o' AS src FROM orders
           |  UNION ALL SELECT c_custkey AS k, 'c' AS src FROM customer)
           |GROUP BY src""".stripMargin))

  /** Uncorrelated scalar subquery as a filter (Catalyst plans a
    * broadcast of the single-row subquery result). */
  val q36ScalarSubq = NamedQuery(
    "q36_scalar_subq",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_x")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders_x
              |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders_x)""".stripMargin)
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)""".stripMargin))

  /** Engine-PORTABLE approximate sketches — the oracle-checkable form
    * of the approx-sketch operator: the same estimator class (HLL
    * count-distinct, quantile from a bounded sample) built on
    * content-addressed md5 derivations instead of engine-private
    * hashes, so a second engine reproduces the estimates bit for bit.
    * (An engine-native twin on approx_count_distinct/approx_percentile
    * was registered as q37 through round 6; being engine-defined it
    * could only ever be rows-only-checked, so it was retired in favor
    * of this query — the native functions' error bounds stay asserted
    * in SkewJoinSpec, and the registry stays 100% oracle-checked.)
    *
    * HLL: p=9 (512 registers); row hash = the lower 52 bits of the
    * first little-endian md5 half (DuckDB md5_number_upper — the same
    * primitive as the minhash chain); register = low 9 bits, rho =
    * leading-rank of the remaining 43 bits via length(bin(w)) (identical
    * on both engines). The Σ2^−M register sum is computed as the EXACT
    * integer SUM(2^(44−M)) — order-free, ≤ 2^53 — and the single IEEE
    * division happens once at the end; standard small-range correction
    * (m·ln(m/V)) when the raw estimate ≤ 2.5m with empty registers.
    * Median: exact percentile over the 1001 smallest-md5 rows — a
    * deterministic content-keyed reservoir (TakeOrdered, never a global
    * sort). Scale: one 512-row hash-agg + one bounded TakeOrdered, both
    * one-pass — the same cost class as the engine-native sketches. */
  val q59PortableSketch = NamedQuery(
    "q59_portable_sketch",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val est = graft.ops.Sketches.hllDistinct(
        li, "l_orderkey", p = 9, as = "hll_orders")
      val med = graft.ops.Sketches.sampledMedian(li,
        round(col("l_extendedprice") * 100, 0).cast("long"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber")),
        cap = 1001, as = "sample_median_cents")
      val ex = li.agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n"))
      est.crossJoin(med).crossJoin(ex)
        .select(col("hll_orders"), col("exact_orders"),
          col("sample_median_cents"), col("n"))
    },
    Some("""WITH h AS (
           |  SELECT md5_number_upper(CAST(l_orderkey AS VARCHAR)) & ((1::BIGINT << 52) - 1) AS hp
           |  FROM lineitem),
           |b AS (SELECT hp & 511 AS reg, hp >> 9 AS w FROM h),
           |r AS (SELECT reg, MAX(CASE WHEN w = 0 THEN 44 ELSE 44 - length(bin(w)) END) AS M
           |      FROM b GROUP BY reg),
           |spine AS (SELECT g.g AS reg FROM generate_series(0, 511) g(g)),
           |regs AS (SELECT spine.reg, COALESCE(r.M, 0) AS M FROM spine LEFT JOIN r USING (reg)),
           |agg AS (SELECT CAST(SUM(1::BIGINT << CAST(44 - M AS INT)) AS BIGINT) AS s,
           |               CAST(SUM(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
           |        FROM regs),
           |est AS (SELECT round(CASE WHEN (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s <= 1280.0
           |                          AND zeros > 0
           |                     THEN 512 * ln(512.0 / zeros)
           |                     ELSE (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s END, 6) AS hll_orders
           |        FROM agg),
           |samp AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
           |                md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS k2
           |         FROM lineitem ORDER BY k2 LIMIT 1001),
           |med AS (SELECT c AS sample_median_cents FROM (
           |          SELECT c, row_number() OVER (ORDER BY c, k2) AS rn,
           |                 COUNT(*) OVER () AS n FROM samp)
           |        WHERE rn = (n + 1) // 2),
           |ex AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           |              COUNT(*) AS n FROM lineitem)
           |SELECT est.hll_orders, ex.exact_orders, med.sample_median_cents, ex.n
           |FROM est, med, ex""".stripMargin))

  /** Recursive CTE (Spark 4 WITH RECURSIVE): hierarchy walk over a
    * derived 64-ary tree — orders are dense-ranked and node id's parent
    * is (id−2) DIV 64 + 1 (the k-ary-heap parent, so every id ≥ 2 has
    * an in-table parent), and the recursion accumulates (depth,
    * root-path price sum) level by level from the root. The canonical
    * workload shape recursion exists for (BOM explosion, org charts,
    * graph reachability), previously inexpressible without driver
    * loops. Scale: each recursion step is one self-join of the frontier
    * against the ranked table — O(depth) jobs with frontier-sized
    * state, and the 64-ary fan-out keeps depth at log₆₄(n) (4 levels at
    * 150k rows: recursion cost is per LEVEL, so wide trees are the
    * representative cheap case — a binary tree over the same rows costs
    * 18 levels of per-step overhead for identical semantics). Integer
    * cents keep the path sums exact. */
  val q60RecursiveCte = NamedQuery(
    "q60_recursive_cte",
    (s, dir) => {
      // The global rank is ops/Ranking.globalRowNumber — the two-phase
      // partition-offset rank — NOT an unpartitioned row_number window,
      // which would sort the whole table in ONE task. CTEs (and temp
      // views) are inlined into every recursion step, so the ranked
      // frame is localCheckpoint'ed (once more, above the narrow rank
      // projection Ranking already checkpoints under) and the recursion
      // self-joins the materialized partitions.
      graft.ops.Ranking.globalRowNumber(
          Tables.orders(s, dir)
            .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents"),
          Seq(col("o_orderkey")), rankCol = "id")
        .select(col("id"), col("cents"))
        .localCheckpoint()
        .createOrReplaceTempView("ranked_q60")
      s.sql("""WITH RECURSIVE walk(id, depth, path_cents) AS (
              |  SELECT id, CAST(1 AS BIGINT) AS depth, cents AS path_cents
              |  FROM ranked_q60 WHERE id = 1
              |  UNION ALL
              |  SELECT r.id, w.depth + 1, w.path_cents + r.cents
              |  FROM ranked_q60 r JOIN walk w ON (r.id - 2) DIV 64 + 1 = w.id
              |  WHERE r.id >= 2)
              |SELECT id, depth, path_cents FROM walk""".stripMargin)
    },
    Some("""WITH RECURSIVE ranked AS (
           |  SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS id,
           |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders),
           |walk(id, depth, path_cents) AS (
           |  SELECT id, CAST(1 AS BIGINT) AS depth, cents AS path_cents
           |  FROM ranked WHERE id = 1
           |  UNION ALL
           |  SELECT r.id, w.depth + 1, w.path_cents + r.cents
           |  FROM ranked r JOIN walk w ON (r.id - 2) // 64 + 1 = w.id
           |  WHERE r.id >= 2)
           |SELECT id, depth, path_cents FROM walk""".stripMargin))

  /** VARIANT (Spark 4 native semi-structured type): props parses ONCE
    * to a binary variant and typed paths are extracted with
    * variant_get — the schema-on-read path that replaces per-access
    * string re-parsing (get_json_object re-tokenizes the JSON text on
    * every call; a variant column tokenizes once per row). Missing
    * paths are NULL, counted per group. Oracle: DuckDB's JSON
    * extraction yields the same typed values. */
  val q61VariantJson = NamedQuery(
    "q61_variant_json",
    (s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"),
          expr("parse_json(props)").as("_v"))
        .select(col("event_type"),
          expr("variant_get(_v, '$.k', 'long')").as("_k"),
          expr("variant_get(_v, '$.missing', 'long')").as("_miss"))
        .groupBy(col("event_type"))
        .agg(sum(col("_k")).as("k_sum"), max(col("_k")).as("k_max"),
          count(col("_k")).as("n_k"),
          sum(when(col("_miss").isNull, 1L).otherwise(0L)).as("n_missing"))
    },
    Some("""SELECT event_type,
           |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           |       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
           |       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
           |FROM events GROUP BY event_type""".stripMargin))

  /** Count-min sketch (the third classic sketch next to q59's HLL and
    * sampled quantile), engine-portable and therefore oracle-checked:
    * depth 4 × width 1024 counters; rows use the Kirsch–Mitzenmacher
    * construction cell_r = (a + r·b) & (w−1) with a, b the two 26-bit
    * halves of ONE md5 per key, so the hot path hashes once, not depth
    * times, and the sums stay < 2²⁸ — no overflow divergence between
    * Spark's wrapping longs and DuckDB's checked BIGINT. The frequency
    * estimate for a key is the MIN over its four counters, with the
    * count-min guarantee est ≥ true (one-sided error, asserted in
    * spec). Everything is integer arithmetic — no floats anywhere.
    *
    * Scale shape: the sketch build is one explode(×4)+hash-agg pass —
    * the counter table is bounded at depth×width rows regardless of
    * input size (THE point of the sketch: frequency state that fits in
    * memory when distinct keys don't); the demo then estimates the top
    * 20 true heavy hitters (TakeOrdered) by joining their hash cells
    * against the counters. */
  val q62CountMin = NamedQuery(
    "q62_countmin",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sketch = graft.ops.Sketches.countMinCounters(
        li, "l_partkey", depth = 4, width = 1024)
      val top = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("l_partkey"))
        .limit(20)
      graft.ops.Sketches.countMinEstimate(top, sketch, "l_partkey")
        .select(col("l_partkey"), col("true_n"), col("est_n"))
    },
    Some("""WITH h AS (
           |  SELECT l_partkey,
           |         md5_number_upper(CAST(l_partkey AS VARCHAR)) & 67108863 AS a,
           |         (md5_number_upper(CAST(l_partkey AS VARCHAR)) >> 26) & 67108863 AS b0
           |  FROM lineitem),
           |cells AS (SELECT r.r, (a + r.r * b0) & 1023 AS b
           |          FROM h CROSS JOIN generate_series(0, 3) r(r)),
           |counters AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY r, b),
           |top AS (SELECT l_partkey, COUNT(*) AS true_n FROM lineitem
           |        GROUP BY l_partkey ORDER BY true_n DESC, l_partkey LIMIT 20),
           |probe AS (
           |  SELECT t.l_partkey, t.true_n, r.r,
           |         ((md5_number_upper(CAST(t.l_partkey AS VARCHAR)) & 67108863)
           |          + r.r * ((md5_number_upper(CAST(t.l_partkey AS VARCHAR)) >> 26) & 67108863)) & 1023 AS b
           |  FROM top t CROSS JOIN generate_series(0, 3) r(r))
           |SELECT p.l_partkey, p.true_n, CAST(MIN(c.n) AS BIGINT) AS est_n
           |FROM probe p JOIN counters c USING (r, b)
           |GROUP BY p.l_partkey, p.true_n""".stripMargin))

  /** Mergeable sketch state (the incremental/partitioned form a 100 TB
    * pipeline actually stores): HLL register tables are built as
    * PARTIALS over disjoint slices of lineitem, unioned with the
    * register-wise-MAX merge (associative/commutative/idempotent — see
    * ops/Sketches.hllMerge), and the merged estimate is checked against
    * the monolithic single-pass build: bit-identical by the merge law.
    * This is q51's partial-merge pattern applied to sketches — daily
    * partial registers (≤ m rows each) compose into any window's
    * distinct count without re-reading history. Oracle: DuckDB builds
    * the same per-half register CTEs, max-merges them, and estimates
    * with the identical integer arithmetic. */
  val q63SketchMerge = NamedQuery(
    "q63_sketch_merge",
    (s, dir) => {
      import graft.ops.Sketches
      val li = Tables.lineitem(s, dir)
      val halves = Seq(0, 1).map(h =>
        Sketches.hllRegisters(li.where(col("l_orderkey") % 2 === h), "l_orderkey"))
      val merged = Sketches.hllEstimate(Sketches.hllMerge(halves), "hll_merged")
      val direct = Sketches.hllDistinct(li, "l_orderkey", as = "hll_direct")
      val ex = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      merged.crossJoin(direct).crossJoin(ex)
    },
    Some("""WITH h AS (
           |  SELECT l_orderkey,
           |         md5_number_upper(CAST(l_orderkey AS VARCHAR)) & ((1::BIGINT << 52) - 1) AS hp
           |  FROM lineitem),
           |b AS (SELECT l_orderkey % 2 AS half, hp & 511 AS reg, hp >> 9 AS w FROM h),
           |pr AS (SELECT half, reg,
           |              MAX(CASE WHEN w = 0 THEN 44 ELSE 44 - length(bin(w)) END) AS M
           |       FROM b GROUP BY half, reg),
           |mr AS (SELECT reg, MAX(M) AS M FROM pr GROUP BY reg),
           |dr AS (SELECT reg,
           |              MAX(CASE WHEN w = 0 THEN 44 ELSE 44 - length(bin(w)) END) AS M
           |       FROM b GROUP BY reg),
           |magg AS (SELECT CAST(SUM(1::BIGINT << CAST(44 - M AS INT)) AS BIGINT)
           |                  + (512 - COUNT(*)) * 17592186044416 AS s,
           |                512 - COUNT(*) AS zeros
           |         FROM mr),
           |dagg AS (SELECT CAST(SUM(1::BIGINT << CAST(44 - M AS INT)) AS BIGINT)
           |                  + (512 - COUNT(*)) * 17592186044416 AS s,
           |                512 - COUNT(*) AS zeros
           |         FROM dr),
           |mest AS (SELECT round(CASE WHEN (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s <= 1280.0
           |                           AND zeros > 0
           |                      THEN 512 * ln(512.0 / zeros)
           |                      ELSE (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s END, 6) AS hll_merged
           |         FROM magg),
           |dest AS (SELECT round(CASE WHEN (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s <= 1280.0
           |                           AND zeros > 0
           |                      THEN 512 * ln(512.0 / zeros)
           |                      ELSE (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s END, 6) AS hll_direct
           |         FROM dagg),
           |ex AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders FROM lineitem)
           |SELECT mest.hll_merged, dest.hll_direct, ex.exact_orders
           |FROM mest, dest, ex""".stripMargin))

  /** TPC-H Q3 shape: 3-way join, date filters on both fact sides,
    * grouped revenue, top-10. The canonical "does the optimizer behave"
    * query: both filters must reach the scans, customer must broadcast,
    * and the limit must plan as TakeOrderedAndProject. */
  val q38Tpch3 = NamedQuery(
    "q38_tpch3",
    (s, dir) => {
      val cust = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).where(col("o_orderdate") < "1995-03-15")
      val li = Tables.lineitem(s, dir).where(col("l_shipdate") > "1995-03-15")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |              JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
           |  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
           |GROUP BY 1, 2
           |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q5 shape: 5-way join (fact + 4 dims), local-supplier
    * predicate (customer and supplier share a nation), revenue by
    * nation. All dims broadcast; the only big shuffle is
    * orders ⋈ lineitem. */
  val q39Tpch5 = NamedQuery(
    "q39_tpch5",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
        .where(year(col("o_orderdate")) === 1996)
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
    },
    Some("""SELECT n_name,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |              JOIN lineitem ON o_orderkey = l_orderkey
           |              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |              JOIN nation ON s_nationkey = n_nationkey
           |WHERE year(CAST(o_orderdate AS DATE)) = 1996
           |GROUP BY n_name""".stripMargin))

  /** JSON scalar family, typed-parse path: from_json with a declared
    * schema (vs q43's get_json_object string extraction) feeding an
    * aggregation. The parse is a narrow codegen'd projection — a scan
    * stays a scan; only the 5-group aggregate exchanges. */
  val q44JsonFuncs = NamedQuery(
    "q44_json_funcs",
    (s, dir) => {
      val k = from_json(col("props"), "k LONG", Map.empty[String, String]).getField("k")
      Tables.events(s, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("k")).as("k_sum"),
          max(col("k")).as("k_max"),
          count(col("k")).as("n_k"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT event_type,
           |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           |       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
           |       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_k,
           |       COUNT(*) AS n
           |FROM events GROUP BY event_type""".stripMargin))

  /** Higher-order array functions (transform / aggregate / filter /
    * array_max) over the embedding column, on the d06 integer-quantize
    * recipe (round(x*1000) — HALF_UP on both engines) so the per-row
    * reductions are exact integer arithmetic. Single narrow projection,
    * zero shuffles — the per-row form of the similarity hot loop. */
  val q45ArrayHof = NamedQuery(
    "q45_array_hof",
    (s, dir) => {
      val qe = transform(col("embedding"), x => round(x.cast("double") * 1000, 0).cast("long"))
      Tables.embeddings(s, dir)
        .select(col("vec_id"), qe.as("e"))
        .select(
          col("vec_id"),
          size(col("e")).cast("long").as("n_dims"),
          aggregate(col("e"), lit(0L), (acc, x) => acc + x * x).as("qnorm2"),
          array_max(col("e")).as("qmax"),
          size(filter(col("e"), x => x > 0)).cast("long").as("n_pos"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |         list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x * 1000) AS BIGINT)) AS e
           |  FROM embeddings)
           |SELECT vec_id,
           |       CAST(len(e) AS BIGINT) AS n_dims,
           |       CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT) AS qnorm2,
           |       list_max(e) AS qmax,
           |       CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos
           |FROM q""".stripMargin))

  /** MERGE / snapshot-diff (the SCD change-capture primitive): classify
    * every key of two snapshot versions as insert / delete / update /
    * unchanged via one full-outer join on the key. Snapshots are
    * deterministic slices of orders: old = pre-1996; new = pre-1997
    * minus keys ≡ 0 (mod 13) ("cancelled"), with prices revised +1.00 on
    * keys ≡ 0 (mod 7). The changelog this emits is exactly what a MERGE
    * INTO / CDC apply step consumes. Scale shape: one shuffle-or-AQE
    * join on the key, both sides filtered at the scan; integer cents
    * keep the diff predicate exact. */
  val q49ScdMerge = NamedQuery(
    "q49_scd_merge",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val old = ord.where(col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey"), Exact.cents(col("o_totalprice")).as("old_cents"))
      val neu = ord.where(col("o_orderdate") < "1997-01-01" && col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"),
          (Exact.cents(col("o_totalprice"))
            + when(col("o_orderkey") % 7 === 0, 100L).otherwise(0L)).as("new_cents"))
      old.join(neu, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          when(col("old_cents").isNull, "insert")
            .when(col("new_cents").isNull, "delete")
            .when(col("old_cents") =!= col("new_cents"), "update")
            .otherwise("unchanged").as("action"),
          col("old_cents"), col("new_cents"))
    },
    Some("""WITH old AS (
           |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS old_cents
           |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1996-01-01'),
           |new AS (
           |  SELECT o_orderkey,
           |         CAST(round(o_totalprice * 100) AS BIGINT)
           |           + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS new_cents
           |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
           |    AND o_orderkey % 13 <> 0)
           |SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           |       CASE WHEN old.o_orderkey IS NULL THEN 'insert'
           |            WHEN new.o_orderkey IS NULL THEN 'delete'
           |            WHEN old_cents <> new_cents THEN 'update'
           |            ELSE 'unchanged' END AS action,
           |       old_cents, new_cents
           |FROM old FULL OUTER JOIN new USING (o_orderkey)""".stripMargin))

  /** Unpivot / melt (wide → long): the inverse of q31's pivot. The four
    * lineitem measures unpivot to (measure, cents) rows — Catalyst plans
    * a single Expand (one pass, 4× rows, no shuffle) feeding one small
    * aggregate; nothing scales with the measure count but the Expand
    * width. */
  val q50Unpivot = NamedQuery(
    "q50_unpivot",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          Exact.cents(col("l_quantity")).as("quantity"),
          Exact.cents(col("l_extendedprice")).as("extendedprice"),
          Exact.cents(col("l_discount")).as("discount"),
          Exact.cents(col("l_tax")).as("tax"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
          "measure", "cents")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
    },
    Some("""SELECT measure, COUNT(*) AS n,
           |       CAST(SUM(cents) AS BIGINT) AS total_cents,
           |       MIN(cents) AS min_cents, MAX(cents) AS max_cents
           |FROM (
           |  SELECT 'quantity' AS measure, CAST(round(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
           |  UNION ALL SELECT 'extendedprice', CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
           |  UNION ALL SELECT 'discount', CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
           |  UNION ALL SELECT 'tax', CAST(round(l_tax * 100) AS BIGINT) FROM lineitem)
           |GROUP BY measure""".stripMargin))

  /** Incremental re-aggregation (partial-merge): the "never recompute
    * history" pattern — a materialized per-group state (counts + sums
    * over the closed period) merges with a delta aggregate (the open
    * period) by summing partials, and the result must equal the full
    * recomputation (which is exactly what the oracle states). Works
    * because count/sum are commutative monoids — the same property that
    * makes map-side partial aggregation correct. At 100 TB the state
    * side is a few rows per group read from a gold table; only the delta
    * scans raw data. Integer cents keep the merge exact. */
  val q51IncrementalAgg = NamedQuery(
    "q51_incremental_agg",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Exact.centsSum(col("o_totalprice")).as("cents"))
      val state = partial(ord.where(col("o_orderdate") < "1997-01-01"))
      val delta = partial(ord.where(col("o_orderdate") >= "1997-01-01"))
      state.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           |FROM orders GROUP BY o_orderpriority""".stripMargin))

  /** Arg-max via struct-ordered MAX: the "latest row per key" primitive
    * as ONE hash-aggregate — max(struct(ts, id, payload...)) rides
    * Spark's lexicographic struct comparison, so the winner is
    * deterministic ((ts, event_id) is a total order) and the plan is a
    * partial+final agg with map-side combine — no window, no sort, no
    * per-key row shuffle (only one struct per key crosses the wire). The
    * oracle states the same result via the window formulation — value
    * equality across two different mechanisms is the point. */
  val q52ArgMax = NamedQuery(
    "q52_argmax",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max(struct(col("ts"), col("event_id"), col("event_type"), col("value")))
            .as("m"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("m.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"),
          col("m.event_id").as("last_event_id"),
          col("m.event_type").as("last_event_type"),
          Exact.cents(col("m.value")).as("last_value_cents"),
          col("n_events"))
    },
    Some("""SELECT user_id,
           |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           |       event_id AS last_event_id,
           |       event_type AS last_event_type,
           |       CAST(round(value * 100) AS BIGINT) AS last_value_cents,
           |       n_events
           |FROM (SELECT *, COUNT(*) OVER (PARTITION BY user_id) AS n_events,
           |             row_number() OVER (PARTITION BY user_id
           |                                ORDER BY ts DESC, event_id DESC) AS rk
           |      FROM events)
           |WHERE rk = 1""".stripMargin))

  /** Ordered conversion funnel view → click → purchase within a 72-hour
    * window of funnel entry — runs the SINGLE-SHUFFLE sorted-fold form
    * (EventAnalytics.funnelOnePass, the 100 TB-preferred shape; the
    * join-chain form funnel() is the semantic reference and proven equal
    * on tie-free logs in EventAnalyticsSpec). The tie-free precondition
    * is ASSERTED, not assumed: ExtendedQueriesSpec checks distinct
    * (user_id, ts) == row count at every SF, so regenerated test data
    * with tied timestamps fails the suite instead of silently breaking
    * the oracle hash match. */
  val q53Funnel = NamedQuery(
    "q53_funnel",
    (s, dir) => {
      graft.ops.EventAnalytics.funnelOnePass(Tables.events(s, dir),
        "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"), horizonHours = 72)
    },
    Some("""WITH s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
           |            WHERE event_type = 'view' GROUP BY 1),
           |d0 AS (SELECT user_id, t0, t0 + INTERVAL 72 HOUR AS deadline FROM s0),
           |s1 AS (SELECT e.user_id, MIN(e.ts) AS t1
           |       FROM events e JOIN d0 ON e.user_id = d0.user_id
           |       WHERE e.event_type = 'click' AND e.ts >= d0.t0 AND e.ts <= d0.deadline
           |       GROUP BY 1),
           |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           |       FROM events e JOIN s1 ON e.user_id = s1.user_id
           |                     JOIN d0 ON e.user_id = d0.user_id
           |       WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 AND e.ts <= d0.deadline
           |       GROUP BY 1)
           |SELECT CAST(0 AS BIGINT) AS stage, 'view' AS step,
           |       (SELECT COUNT(*) FROM s0) AS n_users
           |UNION ALL
           |SELECT 1, 'click', (SELECT COUNT(*) FROM s1)
           |UNION ALL
           |SELECT 2, 'purchase', (SELECT COUNT(*) FROM s2)""".stripMargin))

  /** Cohort retention matrix (first-active-day cohorts × day offset) —
    * see graft.ops.EventAnalytics.retentionCohorts (distinct-first, so
    * the log collapses before any window). */
  val q54Retention = NamedQuery(
    "q54_retention",
    (s, dir) => {
      graft.ops.EventAnalytics.retentionCohorts(Tables.events(s, dir), "user_id", "ts")
    },
    Some("""WITH d AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
           |c AS (SELECT u, day, MIN(day) OVER (PARTITION BY u) AS cohort_day FROM d)
           |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           |       CAST(day - cohort_day AS BIGINT) AS day_offset,
           |       COUNT(*) AS n_users
           |FROM c GROUP BY 1, 2""".stripMargin))

  /** Z-order (Morton) layout audit: interleave the low 8 bits of
    * (l_partkey, l_suppkey), cut the 16-bit key space into 64 buckets,
    * and report each bucket's row count and per-dimension min/max — the
    * narrow ranges in BOTH dimensions are exactly what makes multi-column
    * min/max file pruning work when data is written in z-key order (a
    * plain (x, y) sort prunes only on x). Pure bit arithmetic, one
    * hash-agg (see graft.ops.Bucketing.zOrderKey). */
  val q55ZorderLayout = NamedQuery(
    "q55_zorder_layout",
    (s, dir) => {
      val z = graft.ops.Bucketing.zOrderKey(col("l_partkey"), col("l_suppkey"), 8)
      Tables.lineitem(s, dir)
        .select(z.as("zkey"),
          pmod(col("l_partkey"), lit(256L)).as("x"),
          pmod(col("l_suppkey"), lit(256L)).as("y"))
        .groupBy(shiftright(col("zkey"), 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
    },
    Some {
      // ((v % m) + m) % m = Spark's pmod for any sign — SQL's bare % is
      // sign-preserving, so the non-negative form keeps the oracle
      // faithful even on signed inputs (harmless here, exact contract).
      def pm(c: String) = s"((($c % 256) + 256) % 256)"
      val zTerms = (0 until 8).flatMap(i => Seq(
        s"(((${pm("l_partkey")} >> $i) & 1) << ${2 * i})",
        s"(((${pm("l_suppkey")} >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH z AS (SELECT CAST($zTerms AS BIGINT) AS zkey,
         |                  CAST(${pm("l_partkey")} AS BIGINT) AS x,
         |                  CAST(${pm("l_suppkey")} AS BIGINT) AS y
         |           FROM lineitem)
         |SELECT CAST(zkey >> 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
         |       MIN(x) AS x_min, MAX(x) AS x_max,
         |       MIN(y) AS y_min, MAX(y) AS y_max
         |FROM z GROUP BY 1""".stripMargin
    })

  /** TPC-H Q18 shape (large-volume customers): the HAVING-gated
    * aggregate feeds the join directly — no second lineitem pass to
    * re-aggregate (Q18's textbook SQL re-joins lineitem; reusing the
    * aggregate halves the heavy side). sum(l_quantity) is exact: the
    * quantities are integral doubles, and sums of integral doubles
    * below 2^53 are order-independent. Top-100 plans as
    * TakeOrderedAndProject; the orders/customer joins broadcast the
    * aggregated (filtered-tiny) side. */
  val q56Tpch18 = NamedQuery(
    "q56_tpch18",
    (s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
        .where(col("sum_qty") > 300)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_date"), col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (
           |  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
           |  FROM lineitem GROUP BY 1 HAVING CAST(SUM(l_quantity) AS BIGINT) > 300)
           |SELECT c.c_name, c.c_custkey, o.o_orderkey,
           |       strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
           |       o.o_totalprice, b.sum_qty
           |FROM big b JOIN orders o ON o.o_orderkey = b.l_orderkey
           |           JOIN customer c ON c.c_custkey = o.o_custkey
           |ORDER BY o.o_totalprice DESC, o_date, o.o_orderkey LIMIT 100""".stripMargin))

  /** Repeat-event debounce (24 h same-(user, type) suppression window) —
    * see graft.ops.EventAnalytics.debounce for the adjacent-gap
    * semantics and determinism contract. */
  val q57EventDebounce = NamedQuery(
    "q57_event_debounce",
    (s, dir) => {
      graft.ops.EventAnalytics.debounce(Tables.events(s, dir),
        "user_id", "event_type", "ts", "event_id", windowSeconds = 86400L)
    },
    Some("""WITH g AS (
           |  SELECT event_id, user_id, event_type,
           |         CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           |           PARTITION BY user_id, event_type ORDER BY ts, event_id), -1) AS BIGINT) AS gap_us
           |  FROM events)
           |SELECT event_id, user_id, event_type, gap_us,
           |       (gap_us = -1 OR gap_us >= 86400000000) AS kept
           |FROM g""".stripMargin))

  /** Batch sessionization (EventAnalytics.sessionize): gaps-and-islands
    * with a 30-minute inactivity gap, boundary-identical to the
    * streaming session_window twin (StreamOpsSpec pins the equality).
    * One user-keyed exchange serves both windows and the final
    * aggregate. */
  val q107Sessionize = NamedQuery(
    "q107_sessionize",
    (s, dir) => graft.ops.EventAnalytics.sessionize(
      Tables.events(s, dir), "user_id", "ts", "event_id", gapSeconds = 1800L),
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
           |g AS (SELECT user_id, event_id, us,
           |        CASE WHEN lag(us) OVER w IS NULL
           |               OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
           |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |s AS (SELECT user_id, us,
           |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
           |          ROWS UNBOUNDED PRECEDING) AS session_seq
           |      FROM g)
           |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           |       make_timestamp(MIN(us)) AS session_start,
           |       make_timestamp(MAX(us) + 1800000000) AS session_end,
           |       CAST(COUNT(*) AS BIGINT) AS n_events,
           |       CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
           |FROM s GROUP BY 1, 2""".stripMargin))

  /** q107's SKEW-RESILIENT twin (EventAnalytics.sessionizeSegmented):
    * the same 30-minute sessions computed on per-(user, day) window
    * partitions with boundary stitching, so a bot user holding 10% of
    * the corpus never funnels one sorted task (q29/q107's plain form
    * measures 1.12×/1.40× at 10×/100× skew). Registered against q107's
    * oracle: the gate certifies the decomposition computes the
    * identical result — day-straddling sessions included. */
  val q110SessionizeSegmented = NamedQuery(
    "q110_sessionize_segmented",
    (s, dir) => graft.ops.EventAnalytics.sessionizeSegmented(
      Tables.events(s, dir), "user_id", "ts", "event_id",
      gapSeconds = 1800L),
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
           |g AS (SELECT user_id, event_id, us,
           |        CASE WHEN lag(us) OVER w IS NULL
           |               OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
           |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |s AS (SELECT user_id, us,
           |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
           |          ROWS UNBOUNDED PRECEDING) AS session_seq
           |      FROM g)
           |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           |       make_timestamp(MIN(us)) AS session_start,
           |       make_timestamp(MAX(us) + 1800000000) AS session_end,
           |       CAST(COUNT(*) AS BIGINT) AS n_events,
           |       CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
           |FROM s GROUP BY 1, 2""".stripMargin))

  /** The AUTO front door over q107/q110 (EventAnalytics.sessionizeAuto):
    * probes the user key's skew via skewReport and dispatches — plain
    * one-exchange sessionize on uniform users, the per-(user, day)
    * stitched form when a bot-grade user would funnel one sorted task.
    * On driver testdata user_id is uniform, so THIS query certifies
    * the probe+plain branch against q107's oracle; q110 certifies the
    * segmented branch; the spec certifies the dispatch picks it on a
    * hot fixture and that results never differ. */
  val q111SessionizeAuto = NamedQuery(
    "q111_sessionize_auto",
    (s, dir) => graft.ops.EventAnalytics.sessionizeAuto(
      Tables.events(s, dir), "user_id", "ts", "event_id",
      gapSeconds = 1800L),
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
           |g AS (SELECT user_id, event_id, us,
           |        CASE WHEN lag(us) OVER w IS NULL
           |               OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
           |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |s AS (SELECT user_id, us,
           |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
           |          ROWS UNBOUNDED PRECEDING) AS session_seq
           |      FROM g)
           |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           |       make_timestamp(MIN(us)) AS session_start,
           |       make_timestamp(MAX(us) + 1800000000) AS session_end,
           |       CAST(COUNT(*) AS BIGINT) AS n_events,
           |       CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
           |FROM s GROUP BY 1, 2""".stripMargin))

  /** Pearson correlation per group, integer-exact: built-in corr() sums
    * doubles in shuffle order (nondeterministic last bits), so the five
    * regression sums are accumulated as exact longs over quantized
    * integers (cents × integral quantities) and the coefficient is one
    * IEEE expression over those longs, rounded 6 (the t08/t11 contract).
    * Prices quantize to WHOLE currency units, not cents: Pearson is
    * scale-invariant, and units keep Σy² ≤ n·(1.1e10) inside long range
    * up to ~8×10⁸ rows per group (cents would overflow at this SF).
    * The coefficient terms (n·Σxy − Σx·Σy etc.) are formed AFTER
    * casting each exact long sum to double — as 64-bit integer products
    * they would wrap around 10⁷ rows per group (n²·avg(xy) > 2⁶³),
    * silently in Spark and as an error in DuckDB. The double products
    * stay exact while below 2⁵³ and degrade to ≤1-ulp relative error
    * beyond, identically on both engines. */
  val q58Correlation = NamedQuery(
    "q58_correlation",
    (s, dir) => {
      val x = col("l_quantity").cast("long")
      val y = round(col("l_extendedprice"), 0).cast("long")
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), x.as("_x"), y.as("_y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
          sum(col("_x") * col("_y")).as("sxy"),
          sum(col("_x") * col("_x")).as("sxx"),
          sum(col("_y") * col("_y")).as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              sqrt(col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))),
            6).as("pearson_r"))
    },
    Some("""WITH q AS (
           |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
           |         CAST(round(l_extendedprice) AS BIGINT) AS y
           |  FROM lineitem),
           |s AS (SELECT l_returnflag, COUNT(*) AS n,
           |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           |             CAST(SUM(x * y) AS BIGINT) AS sxy,
           |             CAST(SUM(x * x) AS BIGINT) AS sxx,
           |             CAST(SUM(y * y) AS BIGINT) AS syy
           |      FROM q GROUP BY 1)
           |SELECT l_returnflag, n,
           |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           |             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           |                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           |                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           |                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS pearson_r
           |FROM s""".stripMargin))

  /** Bloom-filter join pruning (the fourth portable sketch, next to
    * q59's HLL, q62's count-min, and q63's merge law): a filter built
    * on the BUILDING-segment customer keys prunes the orders probe side
    * BEFORE any join — the pattern a 100 TB pipeline uses to skip
    * shuffling fact rows that cannot match (runtime row-group skipping,
    * semi-join pushdown). The probe is a pure narrow projection against
    * a ≤512 KB bitmap literal (see ops/Sketches.bloomMightContain —
    * zero shuffle, zero join of probe data), and the query
    * cross-checks it against the exact semi-join: n_false_neg MUST be 0
    * (the Bloom law — asserted by the oracle match, since DuckDB
    * derives the same bitmap), n_false_pos is the measured collision
    * rate at depth 4 × 2^16 bits. */
  val q64BloomPrune = NamedQuery(
    "q64_bloom_prune",
    (s, dir) => {
      import graft.ops.Sketches
      val seg = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING")
      val f = Sketches.bloomBits(seg, "c_custkey", numHashes = 4, numBits = 1 << 16)
      val exact = seg.select(col("c_custkey")).distinct()
        .withColumn("_in_seg", lit(1L))
      Sketches.bloomMightContain(Tables.orders(s, dir), f, "o_custkey")
        .join(broadcast(exact), col("o_custkey") === col("c_custkey"), "left")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("might_contain"), 1L).otherwise(0L)).as("n_bloom_pass"),
          sum(when(col("_in_seg").isNotNull, 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("might_contain") && col("_in_seg").isNull, 1L)
            .otherwise(0L)).as("n_false_pos"),
          sum(when(!col("might_contain") && col("_in_seg").isNotNull, 1L)
            .otherwise(0L)).as("n_false_neg"))
    },
    Some("""WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
           |sh AS (SELECT md5_number_upper(CAST(c_custkey AS VARCHAR)) & 67108863 AS a,
           |              (md5_number_upper(CAST(c_custkey AS VARCHAR)) >> 26) & 67108863 AS b0
           |       FROM seg),
           |bits AS (SELECT DISTINCT (a + r.r * b0) & 65535 AS bit
           |         FROM sh CROSS JOIN generate_series(0, 3) r(r)),
           |probe AS (
           |  SELECT o_orderkey, o_custkey,
           |         ((md5_number_upper(CAST(o_custkey AS VARCHAR)) & 67108863)
           |          + r.r * ((md5_number_upper(CAST(o_custkey AS VARCHAR)) >> 26) & 67108863)) & 65535 AS bit
           |  FROM orders CROSS JOIN generate_series(0, 3) r(r)),
           |pm AS (SELECT o_orderkey, o_custkey,
           |              MIN(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END) AS pass
           |       FROM probe LEFT JOIN bits ON probe.bit = bits.bit
           |       GROUP BY 1, 2),
           |lab AS (SELECT pm.pass,
           |               CASE WHEN seg.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS hit
           |        FROM pm LEFT JOIN seg ON pm.o_custkey = seg.c_custkey)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           |       CAST(SUM(pass) AS BIGINT) AS n_bloom_pass,
           |       CAST(SUM(hit) AS BIGINT) AS n_exact,
           |       CAST(SUM(CASE WHEN pass = 1 AND hit = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           |       CAST(SUM(CASE WHEN pass = 0 AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
           |FROM lab""".stripMargin))

  /** Per-group approximate distinct (distinct users per event type) —
    * the production form of q59's global sketch: exact count-distinct
    * shuffles every (group, key) pair; the grouped HLL shuffles at most
    * groups × 512 register rows (ops/Sketches.hllDistinctByGroup, two
    * bounded hash-aggs). The exact count rides along per group so the
    * estimate's error is visible in the output; the oracle rebuilds
    * the per-group registers with the identical integer arithmetic. */
  val q65HllByGroup = NamedQuery(
    "q65_hll_by_group",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.ops.Sketches.hllDistinctByGroup(ev, "event_type", "user_id",
          p = 9, as = "hll_users")
        .join(ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users")), Seq("event_type"))
    },
    Some("""WITH h AS (
           |  SELECT event_type,
           |         md5_number_upper(CAST(user_id AS VARCHAR)) & ((1::BIGINT << 52) - 1) AS hp
           |  FROM events),
           |b AS (SELECT event_type, hp & 511 AS reg, hp >> 9 AS w FROM h),
           |r AS (SELECT event_type, reg,
           |             MAX(CASE WHEN w = 0 THEN 44 ELSE 44 - length(bin(w)) END) AS M
           |      FROM b GROUP BY 1, 2),
           |agg AS (SELECT event_type,
           |               CAST(SUM(1::BIGINT << CAST(44 - M AS INT)) AS BIGINT)
           |                 + (512 - COUNT(M)) * 17592186044416 AS s,
           |               512 - COUNT(M) AS zeros
           |        FROM r GROUP BY 1),
           |est AS (SELECT event_type,
           |               round(CASE WHEN (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s <= 1280.0
           |                               AND zeros > 0
           |                          THEN 512 * ln(512.0 / zeros)
           |                          ELSE (0.7213 / (1 + 1.079 / 512.0)) * 512 * 512 * 17592186044416.0 / s END, 6) AS hll_users
           |        FROM agg),
           |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
           |       FROM events GROUP BY 1)
           |SELECT est.event_type, est.hll_users, ex.exact_users
           |FROM est JOIN ex USING (event_type)""".stripMargin))

  /** Mergeable quantile sketch (ops/Sketches.logHistCounts →
    * logHistQuantiles): p50/p90/p99/p99.9 of lineitem price cents from
    * a log₂-bucket histogram — the sketch family's QUANTILE member
    * (HLL = distincts, CMS = frequencies, Bloom = membership). Exact
    * percentiles at 100 TB need a global sort or a multi-pass
    * select-k; this is ONE hash-agg into ≤ 64·2^subBits counters that
    * merge by addition across executors/shards/days, then rank
    * resolution over that constant-size state — with a PROVEN
    * one-sided < 2^−4 relative error (spec-asserted vs the exact
    * percentile). All integer arithmetic: the DuckDB oracle replays
    * the identical bucket ladder (length(bin(v))−1 = floor(log₂ v) on
    * both engines) and matches hash-exact. */
  val q99HdrQuantiles = NamedQuery(
    "q99_hdr_quantiles",
    (s, dir) => {
      graft.ops.Sketches.hdrQuantiles(
        Tables.lineitem(s, dir), Exact.cents(col("l_extendedprice")),
        pctsMilli = Seq(500, 900, 990, 999), subBits = 4)
    },
    Some("""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
           |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
           |k AS (SELECT CASE WHEN c < 1 THEN -1
           |        ELSE (length(bin(c)) - 1) * 16 +
           |          (c - (1::BIGINT << (length(bin(c)) - 1))) //
           |            (1::BIGINT << greatest(length(bin(c)) - 1 - 4, 0))
           |        END AS bkey FROM v),
           |h AS (SELECT bkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM k GROUP BY 1),
           |c AS (SELECT bkey, SUM(cnt) OVER (ORDER BY bkey) AS cum,
           |             SUM(cnt) OVER () AS n FROM h),
           |p AS (SELECT * FROM (VALUES (500), (900), (990), (999)) AS t(pct_milli)),
           |r AS (SELECT p.pct_milli, MIN(c.bkey) AS bkey, MIN(c.n) AS n
           |      FROM p JOIN c ON c.cum >= (c.n * p.pct_milli + 999) // 1000
           |      GROUP BY p.pct_milli)
           |SELECT CAST(pct_milli AS BIGINT) AS pct_milli, CAST(n AS BIGINT) AS n,
           |       CAST(CASE WHEN bkey < 0 THEN 0
           |         ELSE (1::BIGINT << (bkey // 16)) +
           |           (bkey % 16) * (1::BIGINT << greatest(bkey // 16 - 4, 0))
           |         END AS BIGINT) AS est
           |FROM r""".stripMargin))

  /** q99's PER-GROUP form: p50/p99 of order value per order priority
    * from one log₂-bucket histogram per group
    * (ops/Sketches.logHistCountsByGroups → logHistQuantilesByGroups) —
    * the grouped-percentile production shape (per-endpoint latency,
    * per-source doc length) whose exact form q32 computes by sorting
    * every group. The sketch shuffles ≤ 64·2^subBits counter rows per
    * group however large the group, folds each group's histogram with
    * a keyed aggregate (no window), and resolves ranks with the same
    * HOF scan as q99 — same integer ladder, hash-exact oracle. */
  val q100HdrByGroup = NamedQuery(
    "q100_hdr_by_group",
    (s, dir) => {
      val counts = graft.ops.Sketches.logHistCountsByGroups(
        Tables.orders(s, dir), Seq("o_orderpriority"),
        Exact.cents(col("o_totalprice")), subBits = 4)
      graft.ops.Sketches.logHistQuantilesByGroups(
        counts, Seq("o_orderpriority"), pctsMilli = Seq(500, 990), subBits = 4)
    },
    Some("""WITH v AS (SELECT o_orderpriority AS g,
           |                  CAST(round(o_totalprice * 100) AS BIGINT) AS c
           |           FROM orders WHERE o_totalprice IS NOT NULL),
           |k AS (SELECT g, CASE WHEN c < 1 THEN -1
           |        ELSE (length(bin(c)) - 1) * 16 +
           |          (c - (1::BIGINT << (length(bin(c)) - 1))) //
           |            (1::BIGINT << greatest(length(bin(c)) - 1 - 4, 0))
           |        END AS bkey FROM v),
           |h AS (SELECT g, bkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM k GROUP BY 1, 2),
           |c AS (SELECT g, bkey,
           |             SUM(cnt) OVER (PARTITION BY g ORDER BY bkey) AS cum,
           |             SUM(cnt) OVER (PARTITION BY g) AS n FROM h),
           |p AS (SELECT * FROM (VALUES (500), (990)) AS t(pct_milli)),
           |r AS (SELECT c.g, p.pct_milli, MIN(c.bkey) AS bkey, MIN(c.n) AS n
           |      FROM p JOIN c ON c.cum >= (c.n * p.pct_milli + 999) // 1000
           |      GROUP BY 1, 2)
           |SELECT g AS o_orderpriority, CAST(pct_milli AS BIGINT) AS pct_milli,
           |       CAST(n AS BIGINT) AS n,
           |       CAST(CASE WHEN bkey < 0 THEN 0
           |         ELSE (1::BIGINT << (bkey // 16)) +
           |           (bkey % 16) * (1::BIGINT << greatest(bkey // 16 - 4, 0))
           |         END AS BIGINT) AS est
           |FROM r""".stripMargin))

  /** WEIGHTED quantiles from the q99 histogram
    * (ops/Sketches.logHistWeightedCounts): byte-weighted document-size
    * percentiles — "the size s such that p% of total corpus BYTES live
    * in documents of size ≤ s", the storage/shard-planning metric a
    * row-weighted percentile cannot answer (a few huge docs carry most
    * bytes). Same constant-state bucket ladder with Σweight per bucket
    * instead of row counts; the rank scan is unchanged because it is
    * already arithmetic over whatever the cnt column sums to. */
  val d42WeightedQuantile = NamedQuery(
    "d42_weighted_quantile",
    (s, dir) => {
      graft.ops.Sketches.logHistQuantiles(
        graft.ops.Sketches.logHistWeightedCounts(
          Tables.documents(s, dir), col("n_chars"), col("n_chars"), subBits = 4),
        pctsMilli = Seq(500, 900, 990), subBits = 4)
    },
    Some("""WITH v AS (SELECT n_chars AS c, n_chars AS w FROM documents
           |           WHERE n_chars IS NOT NULL),
           |k AS (SELECT CASE WHEN c < 1 THEN -1
           |        ELSE (length(bin(c)) - 1) * 16 +
           |          (c - (1::BIGINT << (length(bin(c)) - 1))) //
           |            (1::BIGINT << greatest(length(bin(c)) - 1 - 4, 0))
           |        END AS bkey, w FROM v),
           |h AS (SELECT bkey, CAST(SUM(w) AS BIGINT) AS cnt FROM k GROUP BY 1),
           |c AS (SELECT bkey, SUM(cnt) OVER (ORDER BY bkey) AS cum,
           |             SUM(cnt) OVER () AS n FROM h),
           |p AS (SELECT * FROM (VALUES (500), (900), (990)) AS t(pct_milli)),
           |r AS (SELECT p.pct_milli, MIN(c.bkey) AS bkey, MIN(c.n) AS n
           |      FROM p JOIN c ON c.cum >= (c.n * p.pct_milli + 999) // 1000
           |      GROUP BY p.pct_milli)
           |SELECT CAST(pct_milli AS BIGINT) AS pct_milli, CAST(n AS BIGINT) AS n,
           |       CAST(CASE WHEN bkey < 0 THEN 0
           |         ELSE (1::BIGINT << (bkey // 16)) +
           |           (bkey % 16) * (1::BIGINT << greatest(bkey // 16 - 4, 0))
           |         END AS BIGINT) AS est
           |FROM r""".stripMargin))

  /** Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 orders
    * per customer) — the "for each row, run this parameterized query"
    * surface (Spark 4 / SQL:2016 LATERAL). Catalyst decorrelates it
    * into a per-customer row_number window — distributed and correct —
    * but the rewrite preserves the subquery's ORDER BY with an EXTRA
    * global range exchange before the window, so at scale the
    * hand-written window top-k (q15) is the better plan for these
    * semantics; this query exists to cover the lateral surface and to
    * document that plan cost honestly. Total order (price desc, key)
    * makes the top-2 deterministic. */
  val q66Lateral = NamedQuery(
    "q66_lateral",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_q66")
      Tables.orders(s, dir).createOrReplaceTempView("orders_q66")
      s.sql("""SELECT c.c_custkey, o.o_orderkey, o.cents
              |FROM customer_q66 c JOIN LATERAL (
              |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              |  FROM orders_q66 WHERE o_custkey = c.c_custkey
              |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""".stripMargin)
    },
    Some("""SELECT c.c_custkey, o.o_orderkey, o.cents
           |FROM customer c JOIN LATERAL (
           |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders WHERE o_custkey = c.c_custkey
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON TRUE""".stripMargin))

  /** Per-group median estimate over per-group deterministic reservoirs
    * (ops/Sketches.sampledMedianByGroup): the grouped form of q59's
    * sampled quantile — each order priority's median price from its own
    * content-keyed ≤501-row sample, shipped map-side-bounded by
    * WindowGroupLimit (cap·partitions rows per group max, not the
    * group's population). Oracle replays the same reservoir and
    * percentile-disc per group. */
  val q68GroupedMedian = NamedQuery(
    "q68_grouped_median",
    (s, dir) => {
      graft.ops.Sketches.sampledMedianByGroup(
        Tables.orders(s, dir), "o_orderpriority",
        round(col("o_totalprice") * 100, 0).cast("long"),
        col("o_orderkey").cast("string"),
        cap = 501, as = "median_cents")
    },
    Some("""WITH s AS (
           |  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c,
           |         md5(CAST(o_orderkey AS VARCHAR)) AS k
           |  FROM orders
           |  QUALIFY row_number() OVER (PARTITION BY o_orderpriority ORDER BY k) <= 501),
           |r AS (SELECT o_orderpriority, c,
           |             row_number() OVER (PARTITION BY o_orderpriority ORDER BY c, k) AS rn,
           |             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
           |      FROM s)
           |SELECT o_orderpriority, c AS median_cents FROM r WHERE rn = (n + 1) // 2""".stripMargin))

  /** Skew diagnosis report (ops/SkewJoin.skewReport): the 15 heaviest
    * lineitem order keys with exact-ppm share and the salt factor that
    * would level each across 32 mean-sized reducers — the measurement
    * step q33's salted join needs to pick its factor. One hash-agg +
    * broadcast total + windowless TakeOrdered rank, integer-exact. */
  val q70SkewReport = NamedQuery(
    "q70_skew_report",
    (s, dir) => {
      graft.ops.SkewJoin.skewReport(
        Tables.lineitem(s, dir), "l_orderkey", topK = 15, numPartitions = 32)
    },
    Some("""WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
           |           FROM lineitem GROUP BY 1),
           |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM lineitem),
           |r AS (SELECT l_orderkey, n,
           |             CAST(row_number() OVER (ORDER BY n DESC, l_orderkey) AS BIGINT) AS rank
           |      FROM c)
           |SELECT r.l_orderkey, r.n, r.rank,
           |       n * 1000000 // total AS share_ppm,
           |       (n * 32 + total - 1) // total AS suggested_salt
           |FROM r CROSS JOIN t WHERE rank <= 15""".stripMargin))

  /** Join-size estimation WITHOUT running the join
    * (ops/Sketches.countMinJoinSize): |orders ⋈ lineitem| from two
    * depth-4 × 4096 count-min sketches via the inner-product estimator
    * — min over depth rows of Σ n_a·n_b, one-sided (est ≥ true), exact
    * integers. The exact join size rides along (computed from per-key
    * counts, never the join itself) so the overestimate factor is
    * visible. The sketch-side cost is input-size-free: two bounded
    * counter tables joined on (row, cell). */
  val q71JoinSizeEst = NamedQuery(
    "q71_join_size_est",
    (s, dir) => {
      import graft.ops.Sketches
      val o = Sketches.countMinCounters(
        Tables.orders(s, dir), "o_orderkey", depth = 4, width = 4096)
      val l = Sketches.countMinCounters(
        Tables.lineitem(s, dir), "l_orderkey", depth = 4, width = 4096)
      val exact = Tables.orders(s, dir)
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("_no"))
        .join(Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("_nl")),
          col("o_orderkey") === col("l_orderkey"))
        .agg(sum(col("_no") * col("_nl")).as("exact_join_rows"))
      Sketches.countMinJoinSize(o, l).crossJoin(exact)
    },
    Some("""WITH ho AS (
           |  SELECT md5_number_upper(CAST(o_orderkey AS VARCHAR)) & 67108863 AS a,
           |         (md5_number_upper(CAST(o_orderkey AS VARCHAR)) >> 26) & 67108863 AS b0
           |  FROM orders),
           |co AS (SELECT r.r, (a + r.r * b0) & 4095 AS b, CAST(COUNT(*) AS BIGINT) AS na
           |       FROM ho CROSS JOIN generate_series(0, 3) r(r) GROUP BY 1, 2),
           |hl AS (
           |  SELECT md5_number_upper(CAST(l_orderkey AS VARCHAR)) & 67108863 AS a,
           |         (md5_number_upper(CAST(l_orderkey AS VARCHAR)) >> 26) & 67108863 AS b0
           |  FROM lineitem),
           |cl AS (SELECT r.r, (a + r.r * b0) & 4095 AS b, CAST(COUNT(*) AS BIGINT) AS nb
           |       FROM hl CROSS JOIN generate_series(0, 3) r(r) GROUP BY 1, 2),
           |ip AS (SELECT s.r, COALESCE(SUM(na * nb), 0) AS ip
           |       FROM generate_series(0, 3) s(r)
           |       LEFT JOIN (SELECT co.r, co.b, na, nb FROM co JOIN cl USING (r, b)) j
           |         ON j.r = s.r
           |       GROUP BY 1),
           |est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_rows FROM ip),
           |ex AS (SELECT CAST(SUM(no.n * nl.n) AS BIGINT) AS exact_join_rows
           |       FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1) no
           |       JOIN (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1) nl
           |         ON no.o_orderkey = nl.l_orderkey)
           |SELECT est.est_join_rows, ex.exact_join_rows FROM est, ex""".stripMargin))

  /** GROUPED heavy hitters from ONE count-min sketch — the composite-
    * key pattern: sketching `group:key` folds the group into the hash,
    * so a single depth×width counter table serves every group's
    * frequency queries (no per-group sketch state, no new operator).
    * Top-5 true heavy hitters per lineitem return flag ride along via
    * a rank-partitioned window (plans as WindowGroupLimit), and each
    * probe estimate keeps the one-sided est ≥ true guarantee. */
  val q72HeavyByGroup = NamedQuery(
    "q72_heavy_by_group",
    (s, dir) => {
      import graft.ops.Sketches
      val li = Tables.lineitem(s, dir)
        .withColumn("_ck", concat_ws(":", col("l_returnflag"), col("l_partkey")))
      val sketch = Sketches.countMinCounters(li, "_ck", depth = 4, width = 4096)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("true_n").desc, col("l_partkey"))
      val top = li.groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(count(lit(1)).as("true_n"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .withColumn("_ck", concat_ws(":", col("l_returnflag"), col("l_partkey")))
      Sketches.countMinEstimate(top, sketch, "_ck")
        .select(col("l_returnflag"), col("l_partkey"), col("true_n"),
          col("rank").cast("long").as("rank"), col("est_n"))
    },
    Some("""WITH ck AS (
           |  SELECT l_returnflag, l_partkey,
           |         l_returnflag || ':' || CAST(l_partkey AS VARCHAR) AS k
           |  FROM lineitem),
           |h AS (SELECT k, md5_number_upper(k) & 67108863 AS a,
           |             (md5_number_upper(k) >> 26) & 67108863 AS b0
           |      FROM ck),
           |counters AS (
           |  SELECT r.r, (a + r.r * b0) & 4095 AS b, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM h CROSS JOIN generate_series(0, 3) r(r) GROUP BY 1, 2),
           |top AS (
           |  SELECT l_returnflag, l_partkey, true_n, rank
           |  FROM (SELECT l_returnflag, l_partkey, CAST(COUNT(*) AS BIGINT) AS true_n,
           |               CAST(row_number() OVER (PARTITION BY l_returnflag
           |                    ORDER BY COUNT(*) DESC, l_partkey) AS BIGINT) AS rank
           |        FROM lineitem GROUP BY 1, 2)
           |  WHERE rank <= 5),
           |probe AS (
           |  SELECT t.l_returnflag, t.l_partkey, t.true_n, t.rank, r.r,
           |         ((md5_number_upper(t.l_returnflag || ':' || CAST(t.l_partkey AS VARCHAR)) & 67108863)
           |          + r.r * ((md5_number_upper(t.l_returnflag || ':' || CAST(t.l_partkey AS VARCHAR)) >> 26) & 67108863)) & 4095 AS b
           |  FROM top t CROSS JOIN generate_series(0, 3) r(r))
           |SELECT p.l_returnflag, p.l_partkey, p.true_n, p.rank,
           |       CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS est_n
           |FROM probe p LEFT JOIN counters c ON p.r = c.r AND p.b = c.b
           |GROUP BY 1, 2, 3, 4""".stripMargin))

  /** TPC-H Q10 (returned-item reporting): which customers returned the
    * most revenue in a quarter. The canonical fact-fact-dim shape: the
    * quarter filter is pushed to the orders scan and the return-flag
    * filter to the lineitem scan BEFORE either join (at 100 TB the
    * quarter prunes ~96% of orders partitions); nation broadcasts; the
    * only shuffles are the two fact joins and the customer aggregate;
    * top-20 plans as TakeOrderedAndProject. Revenue in integer cents
    * (the q38 rule: an order-dependent double SUM can differ in the
    * last ulp between engines; cents are an exact integer sum). */
  val q73Tpch10 = NamedQuery(
    "q73_tpch10",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
        .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      val li = Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      val nat = Tables.nation(s, dir)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |              JOIN lineitem ON o_orderkey = l_orderkey
           |              JOIN nation ON c_nationkey = n_nationkey
           |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
           |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
           |  AND l_returnflag = 'R'
           |GROUP BY 1, 2, 3, 4
           |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin))

  /** The ranking-function window family (ntile / percent_rank /
    * cume_dist / dense_rank) in one pass — quartile bucketing and
    * distribution position per (priority, order-date) reporting group.
    * One window shuffle serves all four functions. The partition key is
    * deliberately (priority × day), NOT priority alone: a 5-value
    * partition key would funnel n/5 rows through single tasks at scale
    * — the same trap the single-partition plan guard catches, one level
    * up. The orderBy carries o_orderkey so the order is total: with no
    * peer rows, percent_rank = (rn−1)/(n−1) and cume_dist = rn/n are
    * single IEEE divisions of identical integers on both engines. */
  val q74RankFunctions = NamedQuery(
    "q74_rank_functions",
    (s, dir) => {
      // asc_nulls_last: Spark defaults null-first on ASC, DuckDB
      // null-LAST — on today's corpus o_totalprice is never null, but a
      // regenerated corpus with one null would silently reorder every
      // peer row between the engines (the family NULL rule: align the
      // edge explicitly, don't inherit engine defaults)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"), col("o_orderdate"))
        .orderBy(col("o_totalprice").asc_nulls_last, col("o_orderkey"))
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        dense_rank().over(w).cast("long").as("drank"))
    },
    Some("""SELECT o_orderkey, o_orderpriority,
           |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_day,
           |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           |       percent_rank() OVER w AS pct_rank,
           |       cume_dist() OVER w AS cume,
           |       CAST(dense_rank() OVER w AS BIGINT) AS drank
           |FROM orders
           |WINDOW w AS (PARTITION BY o_orderpriority, o_orderdate
           |             ORDER BY o_totalprice, o_orderkey)""".stripMargin))

  /** TPC-H Q14 shape (promotion-revenue share): conditional aggregation
    * over a fact-dim join — the promo/total split computed in ONE pass
    * (two conditional SUMs), never two joins or two scans. Part
    * broadcasts (the dim); the single shuffle is the per-year hash-agg.
    * Cents keep both sums exact integers; the share is one IEEE
    * division of those longs — deterministic on both engines. */
  val q75PromoRatio = NamedQuery(
    "q75_promo_ratio",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val cents =
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(
          sum(when(col("p_type") === "PROMO", cents).otherwise(0L)).as("promo_cents"),
          sum(cents).as("total_cents"))
        .withColumn("promo_ratio",
          col("promo_cents").cast("double") / col("total_cents"))
    },
    Some("""SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
           |       CAST(SUM(CASE WHEN p_type = 'PROMO'
           |                     THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           |                     ELSE 0 END) AS BIGINT) AS promo_cents,
           |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           |       CAST(SUM(CASE WHEN p_type = 'PROMO'
           |                     THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           |                     ELSE 0 END) AS DOUBLE)
           |         / SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS promo_ratio
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY 1""".stripMargin))

  /** Equi-width value histogram (data profiling): order totals binned
    * at a fixed width with each bin's share of the corpus. Bin ids are
    * pure integer arithmetic (floor of a double/int division — exact on
    * both engines); the share denominator is the broadcast one-row
    * total (the repo's standard pattern — never a whole-frame window),
    * and the two branches share the bin-agg exchange. Fixed width
    * rather than min/max-derived: a histogram whose bin edges move with
    * the data can't be compared across corpus versions, which is the
    * profiling use case. */
  val q76Histogram = NamedQuery(
    "q76_histogram",
    (s, dir) => {
      val bins = Tables.orders(s, dir)
        .groupBy(floor(col("o_totalprice") / 25000).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
      val total = bins.agg(sum(col("n")).as("n_total"))
      bins.crossJoin(broadcast(total))
        .select(col("bin"), (col("bin") * 25000).as("bin_lo"), col("n"),
          (col("n").cast("double") / col("n_total")).as("share"))
    },
    Some("""WITH b AS (
           |  SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
           |         CAST(COUNT(*) AS BIGINT) AS n
           |  FROM orders GROUP BY 1)
           |SELECT bin, bin * 25000 AS bin_lo, n,
           |       CAST(n AS DOUBLE) / (SELECT SUM(n) FROM b) AS share
           |FROM b""".stripMargin))

  /** Relational division ("for all"): customers with an order in EVERY
    * year the corpus covers. The classic divide shape — per-key
    * distinct count compared against the universe's distinct count —
    * expressed scale-first: one (custkey, year)-distinct aggregate, and
    * the universe size as a broadcast one-row aggregate joined back
    * (never a driver-side collect, never a whole-frame window). The
    * naive double-NOT-EXISTS formulation runs a correlated anti-join
    * per (customer, year) pair; this is two hash-aggs. */
  val q77Division = NamedQuery(
    "q77_division",
    (s, dir) => {
      val oy = Tables.orders(s, dir)
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      val perCust = oy.groupBy(col("o_custkey"))
        .agg(countDistinct(col("yr")).as("n_years"))
      val universe = oy.agg(countDistinct(col("yr")).as("n_total"))
      perCust.crossJoin(broadcast(universe))
        .where(col("n_years") === col("n_total"))
        .select(col("o_custkey"), col("n_years"))
    },
    Some("""SELECT o_custkey, CAST(COUNT(DISTINCT year(CAST(o_orderdate AS DATE))) AS BIGINT) AS n_years
           |FROM orders
           |GROUP BY 1
           |HAVING COUNT(DISTINCT year(CAST(o_orderdate AS DATE))) =
           |       (SELECT COUNT(DISTINCT year(CAST(o_orderdate AS DATE))) FROM orders)""".stripMargin))

  /** Per-(corpus, format) scratch dir for the connector round-trip
    * queries — under java.io.tmpdir, keyed by an md5 of the corpus path
    * so concurrent suites over different corpora never collide, and
    * overwritten on every invocation so a stale write can never satisfy
    * the read. On a cluster this would be a shared-FS/object-store
    * staging path; the connector semantics under test are identical. */
  private def rtDir(dir: String, fmt: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_rt_${fmt}_$key"
  }

  /** CSV sink + source round-trip, oracle-gated for FIDELITY, not just
    * rows: the corpus text contains no delimiter characters, so the
    * query derives a `tricky` column embedding a comma and a double
    * quote (the two characters the writer must quote/escape) and
    * injects nulls into an int column (written as the empty field,
    * which the typed reader must map back to null, not 0). The DuckDB
    * oracle recomputes the same aggregate straight from parquet — any
    * quoting, escaping, null-vs-empty, or double-text-precision loss in
    * the round trip hash-mismatches. Embedded NEWLINES are deliberately
    * excluded: parsing them needs multiLine=true, which makes each file
    * a single split — the non-splittable scan is the wrong default for
    * a 100 TB corpus, so the registered query pins the splittable form
    * (documented trade-off, not an oversight). */
  val q103CsvRoundtrip = NamedQuery(
    "q103_csv_roundtrip",
    (s, dir) => {
      val path = rtDir(dir, "csv")
      Tables.customer(s, dir).select(
          col("c_custkey"), col("c_mktsegment"),
          concat(col("c_name"), lit(",\""), col("c_mktsegment")).as("tricky"),
          when(col("c_custkey") % 97 === 0, lit(null).cast("int"))
            .otherwise(col("c_nationkey")).as("nat_or_null"),
          col("c_acctbal"))
        .write.mode("overwrite").option("header", true).csv(path)
      s.read
        .schema("c_custkey LONG, c_mktsegment STRING, tricky STRING, nat_or_null INT, c_acctbal DOUBLE")
        .option("header", true).csv(path)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          Exact.centsSum(col("c_acctbal")).as("acctbal_cents"),
          sum(length(col("tricky"))).as("tricky_chars"),
          sum(when(col("nat_or_null").isNull, 1L).otherwise(0L)).as("n_null_nation"),
          sum(col("nat_or_null")).as("nat_sum"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents,
           |       CAST(SUM(length(c_name || ',"' || c_mktsegment)) AS BIGINT) AS tricky_chars,
           |       CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_nation,
           |       CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_nationkey END) AS BIGINT) AS nat_sum
           |FROM customer GROUP BY c_mktsegment""".stripMargin))

  /** ORC sink + source round-trip over every orders type (BIGINT,
    * VARCHAR, DOUBLE, TIMESTAMP), oracle-gated the same way as q103 —
    * the timestamp min/max is the sharp edge (ORC timestamps are
    * writer-timezone-sensitive; the session pins UTC, and a shift would
    * move first/last_date and mismatch the oracle). ORC scans are
    * splittable with predicate pushdown, so the connector is
    * cluster-clean by construction. */
  val q104OrcRoundtrip = NamedQuery(
    "q104_orc_roundtrip",
    (s, dir) => {
      val path = rtDir(dir, "orc")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          Exact.centsSum(col("o_totalprice")).as("price_cents"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"),
          sum(col("o_orderkey")).as("key_sum"))
    },
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
           |       MIN(o_orderdate) AS first_date,
           |       MAX(o_orderdate) AS last_date,
           |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
           |FROM orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin))

  /** JDBC sink + source round-trip against an embedded Derby database —
    * the relational-connector leg of the format matrix (parquet/JSON/
    * CSV/ORC/JDBC/XML). The WRITE goes through Spark's JDBC sink
    * (prepared-statement batching, so apostrophes and quotes in the
    * `tricky` column need no escaping logic — fidelity is the driver's
    * job and this query gates it); the READ uses the PARTITIONED jdbc
    * path (partitionColumn/lower/upper/numPartitions = 4) so the scan
    * shape under test is the one a cluster uses against a real
    * warehouse — N concurrent range-predicate queries, not one serial
    * cursor. The bounds come from a one-row min/max aggregate on the
    * parquet source (bounded driver work, the documented JDBC-read
    * recipe). Embedded in-memory Derby stands in for the network
    * database: same dialect plumbing, same type mapping
    * (createTableColumnTypes pins VARCHAR over Derby's CLOB default,
    * which would otherwise refuse GROUP BY). Null round-trip rides
    * `nat_or_null` (SQL NULL in, SQL NULL out), money as DOUBLE, and
    * the oracle recomputes everything straight from parquet — any
    * truncation, charset, or null-vs-empty loss hash-mismatches. */
  val q105JdbcRoundtrip = NamedQuery(
    "q105_jdbc_roundtrip",
    (s, dir) => {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val url = s"jdbc:derby:memory:graft_rt_jdbc_$key;create=true"
      val driver = "org.apache.derby.jdbc.EmbeddedDriver"
      val src = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_mktsegment"),
        concat(col("c_name"), lit("','\""), col("c_mktsegment")).as("tricky"),
        when(col("c_custkey") % 97 === 0, lit(null).cast("int"))
          .otherwise(col("c_nationkey")).as("nat_or_null"),
        col("c_acctbal"))
      src.write.format("jdbc").mode("overwrite")
        .option("url", url).option("driver", driver)
        .option("dbtable", "customer_rt")
        .option("createTableColumnTypes",
          "c_mktsegment VARCHAR(32), tricky VARCHAR(256)")
        .save()
      val b = Tables.customer(s, dir)
        .agg(min(col("c_custkey")).as("lo"), max(col("c_custkey")).as("hi"))
        .collect()(0)
      s.read.format("jdbc")
        .option("url", url).option("driver", driver)
        .option("dbtable", "customer_rt")
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", b.getLong(0)).option("upperBound", b.getLong(1))
        .option("numPartitions", 4)
        .load()
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          Exact.centsSum(col("c_acctbal")).as("acctbal_cents"),
          sum(length(col("tricky"))).as("tricky_chars"),
          sum(when(col("nat_or_null").isNull, 1L).otherwise(0L)).as("n_null_nation"),
          sum(col("nat_or_null")).as("nat_sum"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents,
           |       CAST(SUM(length(c_name || ''',''"' || c_mktsegment)) AS BIGINT) AS tricky_chars,
           |       CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_nation,
           |       CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_nationkey END) AS BIGINT) AS nat_sum
           |FROM customer GROUP BY c_mktsegment""".stripMargin))

  /** XML sink + source round-trip (Spark 4's native xml data source) —
    * the document-interchange leg of the format matrix. The `tricky`
    * column embeds the three characters the writer must entity-escape
    * (`<`, `&`, `"`); a null int column checks element-omission →
    * typed-null mapping; doubles check text-serialization precision.
    * The read passes an EXPLICIT schema (no inference job — inference
    * over 100 TB of XML is a full extra scan). Scale note, documented
    * trade-off: XML files are not block-splittable (a row can span
    * block boundaries and tags need context), so scan parallelism
    * comes from FILE COUNT — the write keeps the source's partitioning
    * (one file per task), which is exactly how a large XML exchange
    * corpus should be laid out. */
  val q106XmlRoundtrip = NamedQuery(
    "q106_xml_roundtrip",
    (s, dir) => {
      val path = rtDir(dir, "xml")
      Tables.part(s, dir).select(
          col("p_partkey"), col("p_brand"),
          concat(col("p_name"), lit("<&\">"), col("p_type")).as("tricky"),
          when(col("p_partkey") % 89 === 0, lit(null).cast("int"))
            .otherwise(col("p_size")).as("size_or_null"),
          col("p_retailprice"))
        .write.mode("overwrite")
        .option("rowTag", "part").option("rootTag", "parts")
        .format("xml").save(path)
      s.read
        .schema("p_partkey LONG, p_brand STRING, tricky STRING, size_or_null INT, p_retailprice DOUBLE")
        .option("rowTag", "part")
        .format("xml").load(path)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n"),
          Exact.centsSum(col("p_retailprice")).as("price_cents"),
          sum(length(col("tricky"))).as("tricky_chars"),
          sum(when(col("size_or_null").isNull, 1L).otherwise(0L)).as("n_null_size"),
          sum(col("size_or_null")).as("size_sum"))
    },
    Some("""SELECT p_brand, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
           |       CAST(SUM(length(p_name || '<&">' || p_type)) AS BIGINT) AS tricky_chars,
           |       CAST(SUM(CASE WHEN p_partkey % 89 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_size,
           |       CAST(SUM(CASE WHEN p_partkey % 89 = 0 THEN NULL ELSE p_size END) AS BIGINT) AS size_sum
           |FROM part GROUP BY p_brand""".stripMargin))

  /** Avro sink + source round-trip over the events table — the
    * row-oriented binary leg of the format matrix. This build bundles
    * the Avro FileFormat inside spark-sql but does NOT service-register
    * the `avro` short name (the lookup reserves it for the external
    * module and throws a deploy hint), so the query loads the
    * implementation by fully-qualified class name — Spark's documented
    * fallback for any unregistered source. Exercises the
    * sharp Avro edges: TIMESTAMP (logical timestamp-micros — a
    * lost-precision or timezone shift moves first/last_ts and
    * hash-mismatches), nullable DOUBLE (Avro unions null via branch
    * index, not sentinel), and free-form JSON text in `props`. The
    * oracle recomputes the same exact-cents aggregate straight from
    * parquet. Avro files are block-splittable with sync markers, so the
    * connector scan is cluster-clean by construction. */
  val q108AvroRoundtrip = NamedQuery(
    "q108_avro_roundtrip",
    (s, dir) => {
      val path = rtDir(dir, "avro")
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"),
          when(col("event_id") % 101 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("val_or_null"),
          col("props"))
        .write.mode("overwrite")
        .format("org.apache.spark.sql.avro.AvroFileFormat").save(path)
      s.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(path)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Exact.centsSum(col("val_or_null")).as("value_cents"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          sum(when(col("val_or_null").isNull, 1L).otherwise(0L)).as("n_null_value"),
          sum(length(col("props"))).as("props_chars"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
           |       CAST(SUM(CAST(round(CASE WHEN event_id % 101 = 0 THEN NULL ELSE value END * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           |       MIN(ts) AS first_ts,
           |       MAX(ts) AS last_ts,
           |       CAST(SUM(CASE WHEN event_id % 101 = 0 OR value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
           |       CAST(SUM(length(props)) AS BIGINT) AS props_chars
           |FROM events GROUP BY event_type""".stripMargin))

  /** Bucketed (co-located) fact-fact join: both sides are written ONCE
    * as 8-bucket catalog tables hash-partitioned and sorted on the
    * order key, and the join then plans with NO shuffle Exchange on
    * either side (the zero-shuffle property is plan-asserted in
    * BucketingSpec on this exact shape) — at 100 TB this is the "pay
    * the shuffle once at ingest, never again per query" layout, the
    * join-key analogue of the reference's hive ano/mes partitioning.
    * Cents are fixed BEFORE the write so the bucket files round-trip
    * longs. The oracle recomputes the join + aggregate straight from
    * the source parquet — any bucket misrouting (a row hashed into the
    * wrong bucket joins against nothing) breaks the hash match. */
  val q112BucketedJoin = NamedQuery(
    "q112_bucketed_join",
    (s, dir) => {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val (liT, ordT) = (s"bkt_li_$key", s"bkt_ord_$key")
      graft.ops.Bucketing.writeBucketed(
        Tables.lineitem(s, dir).select(col("l_orderkey"),
          Exact.cents(col("l_extendedprice")).as("price_cents")),
        liT, "l_orderkey", buckets = 8, sortBy = Seq("l_orderkey"),
        path = Some(rtDir(dir, "bktli")))
      graft.ops.Bucketing.writeBucketed(
        Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority")),
        ordT, "l_orderkey", buckets = 8, sortBy = Seq("l_orderkey"),
        path = Some(rtDir(dir, "bktord")))
      graft.ops.Bucketing.bucketedJoin(s, liT, ordT, "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("price_cents")).as("revenue_cents"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_lines,
           |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY 1""".stripMargin))

  /** The two session-set oracle CTEs q113 overlaps: gaps-and-islands
    * sessionization (the q29 SQL) restricted to one event type, with
    * session bounds in exact epoch micros and the session horizon
    * closed at last + 30 min (the sessionize contract). */
  private def sessCte(tag: String, typ: String): String =
    s"""g$tag AS (SELECT user_id, ts, event_id,
       |  CASE WHEN lag(ts) OVER w IS NULL
       |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
       |       THEN 1 ELSE 0 END AS new_s
       |  FROM events WHERE event_type = '$typ'
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s$tag AS (SELECT user_id, epoch_us(MIN(ts)) AS s_us,
       |                 epoch_us(MAX(ts)) + 1800000000 AS e_us
       |          FROM (SELECT user_id, ts,
       |                  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                   ROWS UNBOUNDED PRECEDING) AS sid
       |                FROM g$tag)
       |          GROUP BY user_id, sid)""".stripMargin

  /** Key-scoped interval-overlap join (EventAnalytics.intervalOverlap):
    * which of each user's click-sessions overlap which of their
    * view-sessions — the temporal theta-join the engine answers with
    * bucket expansion + equi-join (quadratic work survives only within
    * a (user, hour) cell; the op doc has the funnel argument). Folded
    * per user: pair count + total overlap in exact micros, so one
    * wrongly-bucketed or double-counted pair breaks the hash. The
    * oracle runs the honest theta join. */
  val q113IntervalOverlap = NamedQuery(
    "q113_interval_overlap",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def sessions(t: String) = graft.ops.EventAnalytics.sessionize(
          ev.where(col("event_type") === t), "user_id", "ts", "event_id",
          gapSeconds = 1800L)
        .select(col("user_id"), col("session_seq"),
          Tables.tsMicros(col("session_start")).as("s_us"),
          Tables.tsMicros(col("session_end")).as("e_us"))
      graft.ops.EventAnalytics.intervalOverlap(
          sessions("click"), sessions("view"), "user_id", "session_seq",
          "s_us", "e_us", bucketSeconds = 3600L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("overlap_us")).as("overlap_us_sum"))
    },
    Some(s"""WITH ${sessCte("a", "click")},
            |${sessCte("b", "view")}
            |SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
            |       CAST(SUM(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us)) AS BIGINT)
            |         AS overlap_us_sum
            |FROM sa a JOIN sb b ON a.user_id = b.user_id
            |  AND a.s_us <= b.e_us AND b.s_us <= a.e_us
            |GROUP BY 1""".stripMargin))

  /** Lakehouse-style manifest-log table (etl/ManifestTable): versioned
    * atomic commits + snapshot isolation + time travel from first
    * principles (no Delta/Iceberg jars exist on this box — SURVEY
    * §2.1's impossibility note; this is the buildable core). The gate
    * certifies the METADATA semantics end to end: v1 overwrite (years
    * ≤ 1996), v2 append (1997), v3 append (≥ 1998), v4 overwrite
    * (1995 only) — then reads snapshot v2 (time travel must exclude
    * v3's files and include v1 ∪ v2's) and the latest (must see ONLY
    * v4's overwrite), each aggregated per year. Any torn commit,
    * mis-assembled file set, or leaked snapshot breaks the hash. The
    * table rebuilds from scratch every run (drop first) so reruns are
    * deterministic. */
  val q115ManifestLog = NamedQuery(
    "q115_manifest_log",
    (s, dir) => {
      val root = rtDir(dir, "mlog")
      graft.etl.ManifestTable.drop(s, root)
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        Exact.cents(col("o_totalprice")).as("price_cents"))
      graft.etl.ManifestTable.commit(o.where(col("yr") <= 1996), root, "overwrite")
      graft.etl.ManifestTable.commit(o.where(col("yr") === 1997), root, "append")
      graft.etl.ManifestTable.commit(o.where(col("yr") >= 1998), root, "append")
      graft.etl.ManifestTable.commit(o.where(col("yr") === 1995), root, "overwrite")
      def agg(df: org.apache.spark.sql.DataFrame, v: Long) =
        df.groupBy(col("yr"))
          .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("cents"))
          .select(lit(v).as("version"), col("yr"), col("n"), col("cents"))
      agg(graft.etl.ManifestTable.read(s, root, Some(2L)), 2L)
        .unionByName(agg(graft.etl.ManifestTable.read(s, root), 4L))
    },
    Some("""SELECT CAST(2 AS BIGINT) AS version,
           |       CAST(year(o_orderdate) AS BIGINT) AS yr,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           |FROM orders WHERE year(o_orderdate) <= 1997 GROUP BY 2
           |UNION ALL
           |SELECT CAST(4 AS BIGINT),
           |       CAST(year(o_orderdate) AS BIGINT),
           |       CAST(COUNT(*) AS BIGINT),
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 2""".stripMargin))

  /** Shared build step for the q116/q117 stats-pruned manifest tables:
    * one commit PER ORDER-YEAR (coalesce(1) → exactly one data file
    * each, min=max=year in the manifest line), looping only over years
    * the corpus actually has so the file count is oracle-derivable as
    * COUNT(DISTINCT year) at any SF. Returns the sorted year list. */
  private def commitPerYear(s: SparkSession, root: String,
      o: DataFrame): Seq[Long] = {
    graft.etl.ManifestTable.drop(s, root)
    val years = o.select(col("yr")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq // bounded: one row per year
    years.zipWithIndex.foreach { case (y, i) =>
      graft.etl.ManifestTable.commit(o.where(col("yr") === y).coalesce(1),
        root, if (i == 0) "overwrite" else "append", statsCol = Some("yr"))
    }
    years
  }

  /** File-level stats pruning (ManifestTable.readPruned) — the
    * data-skipping half of a lakehouse format: each commit records
    * min/max of the stats column per data file IN the manifest line,
    * and a ranged read plans only intersecting files, metadata-only,
    * zero I/O on the rest. The gate certifies both halves: the pruned
    * read's per-year aggregates (one wrongly pruned file breaks the
    * hash) AND the pruning tally itself — files kept vs named, which
    * the oracle re-derives as distinct-year counts because the build
    * step writes exactly one file per year. At 100 TB this is the
    * difference between scanning a partition's worth of files and
    * scanning the table: stats collection cost is one narrow agg over
    * only the NEW files at commit time. */
  val q116ManifestPrune = NamedQuery(
    "q116_manifest_prune",
    (s, dir) => {
      val root = rtDir(dir, "mprune")
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        Exact.cents(col("o_totalprice")).as("price_cents"))
      commitPerYear(s, root, o)
      val pr = graft.etl.ManifestTable.readPruned(s, root, 1996L, 1998L)
      val data = pr.df.where(col("yr").between(1996, 1998))
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("cents"))
        .select(lit("data").as("tag"), col("yr").as("k"), col("n"), col("cents"))
      val files = s.range(1).select(lit("files").as("tag"), lit(0L).as("k"),
        lit(pr.filesKept).as("n"), lit(pr.filesTotal).as("cents"))
      data.unionByName(files)
    },
    Some("""SELECT 'data' AS tag, CAST(year(o_orderdate) AS BIGINT) AS k,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           |FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998 GROUP BY 2
           |UNION ALL
           |SELECT 'files', CAST(0 AS BIGINT),
           |       CAST(COUNT(DISTINCT CASE WHEN year(o_orderdate) BETWEEN 1996 AND 1998
           |                                THEN year(o_orderdate) END) AS BIGINT),
           |       CAST(COUNT(DISTINCT year(o_orderdate)) AS BIGINT)
           |FROM orders""".stripMargin))

  /** Compaction + vacuum lifecycle (ManifestTable.compact/vacuum) over
    * a merge-on-read delete: per-year commits (one file each), an
    * equality-delete of every o_orderkey ≡ 3 (mod 10), compaction to
    * 2 files (which MATERIALIZES the delete and clears the tombstone
    * set), then vacuum keeping only the compacted version. The gate
    * hashes the full audit card: every history row (version, commit
    * rows, snapshot file + delete-file counts — all re-derived by the
    * oracle from year ranks), the post-vacuum content, and vacuum's
    * own tally (per-year files + the delete file die; the 2 compacted
    * files live). This is the 100 TB steady-state loop: deletes are
    * metadata-cheap at write, compaction pays the rewrite once,
    * vacuum bounds storage. */
  val q117ManifestCompact = NamedQuery(
    "q117_manifest_compact",
    (s, dir) => {
      import s.implicits._
      val root = rtDir(dir, "mcompact")
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        Exact.cents(col("o_totalprice")).as("price_cents"))
      commitPerYear(s, root, o)
      graft.etl.ManifestTable.delete(s, root,
        o.where(col("o_orderkey") % 10 === 3).select(col("o_orderkey")),
        "o_orderkey")
      graft.etl.ManifestTable.compact(s, root, nFiles = 2)
      val hist = graft.etl.ManifestTable.history(s, root)
        .map { case (v, _, r, f, d) => ("history", v, r, f, d) }
      val (filesDel, manExp) = graft.etl.ManifestTable.vacuum(s, root, keepLast = 1)
      val nLeft = graft.etl.ManifestTable.versions(s, root).size.toLong
      val meta = (hist :+ ("vacuum", 0L, filesDel, manExp, nLeft))
        .toDF("tag", "k", "nrows", "m1", "m2")
      val content = graft.etl.ManifestTable.read(s, root)
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("nrows"), sum(col("price_cents")).as("m1"))
        .select(lit("content").as("tag"), col("yr").as("k"),
          col("nrows"), col("m1"), lit(0L).as("m2"))
      meta.unionByName(content)
    },
    Some("""WITH yrs AS (
           |  SELECT y, n, c, CAST(row_number() OVER (ORDER BY y) AS BIGINT) AS v
           |  FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           |               CAST(COUNT(*) AS BIGINT) AS n,
           |               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
           |        FROM orders GROUP BY 1)),
           |ny AS (SELECT CAST(COUNT(*) AS BIGINT) AS ny FROM yrs),
           |del AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM orders
           |        WHERE o_orderkey % 10 = 3),
           |live AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           |                CAST(COUNT(*) AS BIGINT) AS n,
           |                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
           |         FROM orders WHERE o_orderkey % 10 <> 3 GROUP BY 1)
           |SELECT 'history' AS tag, v AS k, n AS nrows, v AS m1,
           |       CAST(0 AS BIGINT) AS m2 FROM yrs
           |UNION ALL
           |SELECT 'history', CAST(ny + 1 AS BIGINT), (SELECT nd FROM del), ny,
           |       CAST(1 AS BIGINT) FROM ny
           |UNION ALL
           |SELECT 'history', CAST(ny + 2 AS BIGINT),
           |       (SELECT CAST(SUM(n) AS BIGINT) FROM live),
           |       CAST(2 AS BIGINT), CAST(0 AS BIGINT) FROM ny
           |UNION ALL
           |SELECT 'vacuum', CAST(0 AS BIGINT), CAST(ny + 1 AS BIGINT),
           |       CAST(ny + 1 AS BIGINT), CAST(1 AS BIGINT) FROM ny
           |UNION ALL
           |SELECT 'content', y, n, c, CAST(0 AS BIGINT) FROM live""".stripMargin))

  /** Name-based schema evolution on read (ManifestTable.readEvolved):
    * v1 commits (key, yr, cents), v2 APPENDS a new column
    * (priority flag), v3 appends with cents DROPPED — and the evolved
    * read aligns all three by column name, NULL-filling both
    * directions, no history rewrite. Per-year aggregates pin exactly
    * which rows carry which columns: cents sums are NULL for the
    * cents-less years, priority counts are nonzero only for v2's
    * year — one misaligned column breaks the hash. */
  val q118ManifestEvolve = NamedQuery(
    "q118_manifest_evolve",
    (s, dir) => {
      val root = rtDir(dir, "mevolve")
      graft.etl.ManifestTable.drop(s, root)
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        Exact.cents(col("o_totalprice")).as("price_cents"),
        col("o_orderpriority").as("prio"))
      graft.etl.ManifestTable.commit(
        o.where(col("yr") <= 1996).select("o_orderkey", "yr", "price_cents"),
        root, "overwrite")
      graft.etl.ManifestTable.commit(
        o.where(col("yr") === 1997), root, "append")
      graft.etl.ManifestTable.commit(
        o.where(col("yr") >= 1998).select("o_orderkey", "yr"), root, "append")
      graft.etl.ManifestTable.readEvolved(s, root)
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("cents"),
          count(col("prio")).as("n_prio"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(SUM(CASE WHEN year(o_orderdate) <= 1997
           |                THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS cents,
           |       CAST(COUNT(CASE WHEN year(o_orderdate) = 1997 THEN 1 END) AS BIGINT) AS n_prio
           |FROM orders GROUP BY 1""".stripMargin))

  /** Row-level equality deletes, merge-on-read (ManifestTable.delete —
    * Iceberg v2's delete-file shape): deleting every
    * o_orderkey ≡ 2 (mod 7) commits ONE small key file and rewrites
    * nothing; reads anti-join the tombstones. The gate certifies the
    * three load-bearing semantics at once: the live read excludes
    * deleted keys, a later APPEND cannot resurrect them (1995 is
    * appended twice — its deleted keys stay gone while its survivors
    * double), and time travel to v1 still sees every row (the delete
    * touched no data file). At 100 TB: deletes are metadata-sized
    * writes + one broadcast anti-join at read; q117 shows the
    * compaction that retires them. */
  val q119ManifestDelete = NamedQuery(
    "q119_manifest_delete",
    (s, dir) => {
      val root = rtDir(dir, "mdelete")
      graft.etl.ManifestTable.drop(s, root)
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        Exact.cents(col("o_totalprice")).as("price_cents"))
      graft.etl.ManifestTable.commit(o, root, "overwrite")
      graft.etl.ManifestTable.delete(s, root,
        o.where(col("o_orderkey") % 7 === 2).select(col("o_orderkey")),
        "o_orderkey")
      graft.etl.ManifestTable.commit(o.where(col("yr") === 1995), root, "append")
      def agg(df: DataFrame, v: Long) =
        df.groupBy(col("yr"))
          .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("cents"))
          .select(lit(v).as("version"), col("yr"), col("n"), col("cents"))
      agg(graft.etl.ManifestTable.read(s, root, Some(1L)), 1L)
        .unionByName(agg(graft.etl.ManifestTable.read(s, root), 3L))
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey AS k, CAST(year(o_orderdate) AS BIGINT) AS yr,
           |         CAST(round(o_totalprice * 100) AS BIGINT) AS c
           |  FROM orders),
           |ext AS (SELECT * FROM base
           |        UNION ALL SELECT * FROM base WHERE yr = 1995)
           |SELECT CAST(1 AS BIGINT) AS version, yr, CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(SUM(c) AS BIGINT) AS cents
           |FROM base GROUP BY 2
           |UNION ALL
           |SELECT CAST(3 AS BIGINT), yr, CAST(COUNT(*) AS BIGINT),
           |       CAST(SUM(c) AS BIGINT)
           |FROM ext WHERE k % 7 <> 2 GROUP BY 2""".stripMargin))

  /** Bloom-indexed POINT LOOKUP over the manifest table
    * (ManifestTable.readBloomPruned): each per-year commit writes a
    * (file, bit) Bloom SIDECAR parquet next to its data (the
    * real-format index shape — Delta's bloom index, Iceberg's puffin;
    * never inside the manifest), built with q64's portable
    * Kirsch–Mitzenmacher md5 chain. A lookup of one orderkey reads 4
    * probe-bit rows per file from the sidecars and plans only files
    * whose filter passes — the Bloom law makes the miss pruning safe
    * (never prunes the true file) and the ORACLE REPLAYS THE FALSE
    * POSITIVES TOO: per-year bit sets and the probe membership are
    * re-derived in SQL, so files_kept is hash-exact including
    * collisions. The oracle-derived probe key (min orderkey of 1997)
    * keeps the query corpus-adaptive. */
  val q120ManifestBloom = NamedQuery(
    "q120_manifest_bloom",
    (s, dir) => {
      val root = rtDir(dir, "mbloom")
      graft.etl.ManifestTable.drop(s, root)
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        Exact.cents(col("o_totalprice")).as("price_cents"))
      val years = o.select(col("yr")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq // bounded: one row per year
      years.zipWithIndex.foreach { case (y, i) =>
        graft.etl.ManifestTable.commit(o.where(col("yr") === y).coalesce(1),
          root, if (i == 0) "overwrite" else "append",
          bloomCol = Some("o_orderkey"))
      }
      val probeKey = o.where(col("yr") === 1997L)
        .agg(min(col("o_orderkey"))).collect()(0).getLong(0) // one-row probe
      val pr = graft.etl.ManifestTable.readBloomPruned(s, root, probeKey.toString)
      val data = pr.df.where(col("o_orderkey") === probeKey)
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("cents"))
        .select(lit("data").as("tag"), col("yr").as("k"), col("n"), col("cents"))
      val files = s.range(1).select(lit("files").as("tag"), lit(0L).as("k"),
        lit(pr.filesKept).as("n"), lit(pr.filesTotal).as("cents"))
      data.unionByName(files)
    },
    Some("""WITH probe AS (SELECT MIN(o_orderkey) AS pk FROM orders
           |               WHERE year(o_orderdate) = 1997),
           |ph AS (SELECT md5_number_upper(CAST(pk AS VARCHAR)) & 67108863 AS a,
           |              (md5_number_upper(CAST(pk AS VARCHAR)) >> 26) & 67108863 AS b0
           |       FROM probe),
           |pbits AS (SELECT DISTINCT (a + r.r * b0) & 65535 AS bit
           |          FROM ph CROSS JOIN generate_series(0, 3) r(r)),
           |ybits AS (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS y,
           |                 ((md5_number_upper(CAST(o_orderkey AS VARCHAR)) & 67108863)
           |                  + r.r * ((md5_number_upper(CAST(o_orderkey AS VARCHAR)) >> 26)
           |                           & 67108863)) & 65535 AS bit
           |          FROM orders CROSS JOIN generate_series(0, 3) r(r)),
           |pass AS (SELECT y FROM (
           |           SELECT yb.y, COUNT(DISTINCT pb.bit) AS hits
           |           FROM pbits pb JOIN ybits yb ON pb.bit = yb.bit GROUP BY 1)
           |         WHERE hits = (SELECT COUNT(*) FROM pbits))
           |SELECT 'data' AS tag, CAST(year(o_orderdate) AS BIGINT) AS k,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           |FROM orders WHERE o_orderkey = (SELECT pk FROM probe) GROUP BY 2
           |UNION ALL
           |SELECT 'files', CAST(0 AS BIGINT),
           |       (SELECT CAST(COUNT(*) AS BIGINT) FROM pass),
           |       CAST(COUNT(DISTINCT year(o_orderdate)) AS BIGINT)
           |FROM orders""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q103CsvRoundtrip, q104OrcRoundtrip, q105JdbcRoundtrip, q106XmlRoundtrip,
    q108AvroRoundtrip, q112BucketedJoin, q113IntervalOverlap, q115ManifestLog,
    q116ManifestPrune, q117ManifestCompact, q118ManifestEvolve, q119ManifestDelete,
    q120ManifestBloom,
    q70SkewReport, q71JoinSizeEst, q72HeavyByGroup, q75PromoRatio,
    q76Histogram, q77Division,
    q30RangeJoin, q31Pivot, q32Percentiles, q33SaltedJoin, q102SaltedAuto, q34Explode,
    q35UnionAll, q36ScalarSubq, q38Tpch3, q39Tpch5,
    q44JsonFuncs, q45ArrayHof, q49ScdMerge, q50Unpivot, q51IncrementalAgg,
    q52ArgMax, q53Funnel, q54Retention, q55ZorderLayout, q56Tpch18,
    q57EventDebounce, q58Correlation, q59PortableSketch, q60RecursiveCte, q107Sessionize,
    q110SessionizeSegmented, q111SessionizeAuto,
    q61VariantJson, q62CountMin, q63SketchMerge, q64BloomPrune,
    q65HllByGroup, q66Lateral, q68GroupedMedian, q73Tpch10, q74RankFunctions,
    q99HdrQuantiles, q100HdrByGroup, d42WeightedQuantile)
}
