package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Exact, Tables}

/** Reference-parity operators (SURVEY.md §2.1–§2.6) re-expressed over the
  * driver testdata tables, one named query per operator family.
  *
  * The reference (proj-eng-dados/main.py) is a Raw→Bronze→Silver→Gold
  * pandas pipeline; its operator surface is: grouped SUM (main.py:300-307),
  * EDA aggregates (main.py:241-249), coercing casts (main.py:212-213,
  * 228-231), text normalization (main.py:215-226), date parse
  * (main.py:251-253) and assertion-style quality checks (main.py:167-186).
  * Each maps here to a declarative DataFrame plan Catalyst can push down
  * and codegen.
  */
object PipelineQueries {

  /** A1+C7+P4 — the flagship gold aggregation (main.py:300-307):
    * group by (year, month, key) and sum a money measure. Only shuffle in
    * the reference's whole pipeline; Spark plans partial+final hash agg.
    */
  val q01GoldAgg = NamedQuery(
    "q01_gold_agg",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(
          year(col("l_shipdate")).cast("long").as("ano"),
          month(col("l_shipdate")).cast("long").as("mes"),
          col("l_returnflag").as("nome_key"))
        .agg(Exact.moneySum(col("l_extendedprice")).as("total_gasto"))
    },
    Some("""SELECT CAST(year(l_shipdate) AS BIGINT) AS ano,
           |       CAST(month(l_shipdate) AS BIGINT) AS mes,
           |       l_returnflag AS nome_key,
           |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_gasto
           |FROM lineitem GROUP BY 1, 2, 3""".stripMargin))

  /** A2–A5 — the EDA report (main.py:241-249) as ONE aggregate pass
    * instead of the reference's four separate full-column actions.
    */
  val q02EdaSummary = NamedQuery(
    "q02_eda_summary",
    (s, dir) => {
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_customers"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"),
        (Exact.centsSum(col("o_totalprice")).cast("double") / 100 /
          count(lit(1))).as("avg_price"))
    },
    Some("""SELECT COUNT(*) AS n_rows,
           |       COUNT(DISTINCT o_custkey) AS n_customers,
           |       MIN(o_orderdate) AS first_date,
           |       MAX(o_orderdate) AS last_date,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*) AS avg_price
           |FROM orders""".stripMargin))

  /** C2 + JSON scalar surface — coercing numeric cast with null-fill
    * (main.py:212-213: pd.to_numeric(errors='coerce').fillna(0)) applied
    * to a JSON-extracted field of the events table.
    */
  val q03JsonCoerce = NamedQuery(
    "q03_json_coerce",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", coalesce(
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"), lit(0L)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
    },
    Some("""SELECT event_type,
           |       COUNT(*) AS n,
           |       CAST(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k
           |FROM events GROUP BY event_type""".stripMargin))

  /** C3 — text normalization (main.py:215-226): upper+trim, null-safe.
    * Deliberate deviation from pandas' astype(str) NaN->"NAN" artifact
    * (SURVEY §2.3 C3): nulls stay null.
    */
  val q04TextNorm = NamedQuery(
    "q04_text_norm",
    (s, dir) => {
      Tables.customer(s, dir).select(
        col("c_custkey"),
        upper(trim(col("c_name"))).as("name_norm"),
        length(col("c_name")).cast("long").as("name_len"),
        lower(col("c_mktsegment")).as("seg_lower"))
    },
    Some("""SELECT c_custkey,
           |       upper(trim(c_name)) AS name_norm,
           |       CAST(length(c_name) AS BIGINT) AS name_len,
           |       lower(c_mktsegment) AS seg_lower
           |FROM customer""".stripMargin))

  /** C5 — coercing date parse (main.py:251-253): string → date, null on
    * failure; grouped daily counts prove the parse round-trips.
    */
  val q05DateParse = NamedQuery(
    "q05_date_parse",
    (s, dir) => {
      Tables.orders(s, dir)
        .withColumn("parsed", expr("try_cast(date_format(o_orderdate, 'yyyy-MM-dd') AS DATE)"))
        .groupBy(date_format(col("parsed"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n"),
          Exact.centsSum(col("o_totalprice")).as("total_cents"))
    },
    // date emitted as its ISO string: a DATE round-trips through
    // parquet/pandas/duckdb with inconsistent physical types; the string
    // form is representation-proof.
    Some("""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
           |       COUNT(*) AS n,
           |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
           |FROM orders GROUP BY 1""".stripMargin))

  /** V0–V4 — the data-quality gate (main.py:167-186) as a single
    * aggregate pass: every check is a violation counter; the gate passes
    * iff all counters are zero. pandas-compat NULL semantics: a NULL
    * fails `between` (SURVEY §2.5 V2), hence NOT COALESCE(pred, FALSE).
    */
  val q06QualityGate = NamedQuery(
    "q06_quality_gate",
    (s, dir) => {
      import graft.etl.Quality
      val li = Tables.lineitem(s, dir)
      // the operator library's Check ADT IS the implementation — the
      // pandas NULL-semantics decision lives in Quality alone
      def viol(c: Quality.Check) = sum(c.violation)
      li.agg(
        viol(Quality.Predicate("null_keys",
          col("l_orderkey").isNotNull && col("l_returnflag").isNotNull)).as("null_keys"),
        viol(Quality.InRange("l_quantity", 1, 50)).as("qty_out_of_range"),
        viol(Quality.NonNegative("l_extendedprice")).as("neg_price"),
        viol(Quality.InRange("l_discount", 0, 1)).as("bad_discount"))
    },
    Some("""SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
           |       CAST(SUM(CASE WHEN NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS qty_out_of_range,
           |       CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice >= 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS neg_price,
           |       CAST(SUM(CASE WHEN NOT COALESCE(l_discount BETWEEN 0 AND 1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount
           |FROM lineitem""".stripMargin))

  /** C1+C4 — strict vs coercing casts (main.py:142-146, 228-231): a
    * lossless string round-trip of an int column, plus a coerce-to-null
    * cast whose failures are counted instead of raised.
    */
  val q07Casts = NamedQuery(
    "q07_casts",
    (s, dir) => {
      Tables.part(s, dir)
        .groupBy(col("p_brand"))
        .agg(
          sum(expr("CAST(CAST(p_size AS STRING) AS BIGINT)")).as("size_roundtrip"),
          sum(when(expr("try_cast(p_type AS DOUBLE)").isNull, 1L).otherwise(0L))
            .as("uncastable_types"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT p_brand,
           |       CAST(SUM(CAST(CAST(p_size AS VARCHAR) AS BIGINT)) AS BIGINT) AS size_roundtrip,
           |       CAST(SUM(CASE WHEN TRY_CAST(p_type AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS uncastable_types,
           |       COUNT(*) AS n
           |FROM part GROUP BY p_brand""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q01GoldAgg, q02EdaSummary, q03JsonCoerce, q04TextNorm, q05DateParse,
    q06QualityGate, q07Casts)
}
