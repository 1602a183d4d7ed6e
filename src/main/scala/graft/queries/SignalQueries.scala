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
           |wd AS (SELECT doc_id, term, tf,
           |              CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
           |       FROM tf),
           |sc AS (SELECT doc_id, term, tf, df,
           |              tf * ((n_docs * 1000000) // df) AS score_scaled
           |       FROM wd, nd),
           |rk AS (SELECT *, CAST(row_number() OVER (
           |         PARTITION BY doc_id ORDER BY score_scaled DESC, term) AS BIGINT) AS rank
           |       FROM sc)
           |SELECT doc_id, term, tf, df, CAST(score_scaled AS BIGINT) AS score_scaled, rank
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

  val all: Seq[NamedQuery] = Seq(t12Bm25, t13TfidfTerms, q87AnomalyDays, q88Ewma)
}
