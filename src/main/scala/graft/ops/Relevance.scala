package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text relevance scoring over the documents table — the retrieval
  * side of a training-data pipeline (query-anchored corpus probes,
  * "which documents look like this contamination probe") and the
  * engine-capability twin of the t-family's frequency statistics.
  *
  * Determinism contract: both scorers run on an integer quantization
  * ladder (milli/micro fixed-point with explicit floor divisions) so a
  * DuckDB oracle replays the identical arithmetic — no ln(), no float
  * sum, no order dependence. The BM25 idf is therefore the RATIONAL
  * Robertson ratio (N−df+½)/(df+½) rather than its logarithm — a
  * documented variant: per-term scores stay monotone in the true idf,
  * ranks shift only where the log would compress extreme idf gaps.
  */
object Relevance {

  /** Rational-idf BM25 (k1 = 6/5, b = 3/4) of every document against a
    * bag of query terms; top-k docs. One corpus pass: the query-term
    * filter prunes the exploded stream BEFORE the (doc, term) tf
    * aggregate, df folds from the tf frame via a |Q|-row broadcast
    * join (a term-partitioned window here would funnel each term's
    * whole posting list through one task — the q74 trap), and corpus
    * stats (N, ΣLen) ride a broadcast one-row aggregate.
    *
    * The milli ladder, every step a floor division both engines run:
    *   idf_milli   = (2·(N − df) + 1) · 1000  div  (2·df + 1)
    *   lr_milli    = 1000 · len · N  div  ΣLen          (len/avgLen)
    *   d_milli     = 1000·tf + 300 + 9·lr_milli div 10  (tf + k1·(1−b+b·lr))
    *   term score  = 2200 · tf · idf_milli  div  d_milli
    * Overflow bound: 2200·tf·idf_milli < 2⁶³ ⇔ roughly tf·N < 6·10¹⁴ —
    * comfortable for any real corpus/query pair; callers at the edge
    * should pre-cap tf. Output: (doc_id, score_milli, n_terms_hit),
    * top-k by (score desc, doc_id) — plans as TakeOrderedAndProject. */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopDocs needs at least one query term")
    val base = docs
      .where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("_len"), col("_toks"))
    val stats = base.agg(
      count(lit(1)).as("_n_docs"), sum(col("_len")).as("_l_tot"))
    val tf = base
      .select(col("doc_id"), col("_len"), explode(col("_toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("_len"), col("term"))
      .agg(count(lit(1)).as("_tf"))
    val dfFrame = tf.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    tf.join(broadcast(dfFrame), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        expr("""2200L * _tf * (((2L * (_n_docs - _df) + 1L) * 1000L) div (2L * _df + 1L))
               | div (1000L * _tf + 300L
               |      + (9L * ((1000L * _len * _n_docs) div _l_tot)) div 10L)""".stripMargin)
          .as("_s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_s")).as("score_milli"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_milli").desc, col("doc_id"))
      .limit(k)
  }

  /** TF-IDF top-k terms per document with the rational idf
    * (N · 10⁶) div df — t06's raw-frequency ranking re-weighted so
    * corpus-wide boilerplate terms sink (the "what is this doc about"
    * signal a curation pipeline reports). Same plan skeleton as t06:
    * one explode feeding the (doc, term) tf aggregate, df folded from
    * that SAME aggregated frame via `groupBy(term).count` + an equi-join
    * back on the term key (the bm25TopDocs pattern). NEVER a window
    * partitioned by the raw term — a Zipf head term's partition is its
    * whole posting list (≈ the corpus for a stop word), one task at
    * 100×; a skewed JOIN partition, by contrast, AQE splits at runtime.
    * The tf subtree feeds both branches through one ReusedExchange; the
    * df side is left unhinted so AQE broadcasts it when small. N rides
    * a narrow one-row scan; the per-doc rank stays map-side via
    * WindowGroupLimit. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val nDocs = docs
      .where(col(textCol).isNotNull && col(idCol).isNotNull)
      .agg(count(lit(1)).as("_n_docs"))
    val tf = docs
      .where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // cf in the df-branch output keeps its partial aggregate the
    // canonical twin of the tf branch's (pruning would otherwise drop
    // the count and block AQE stage reuse — see TextAnalysis.topTerms)
    val dfFrame = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val wRank = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_scaled").desc, col("term"))
    tf.join(dfFrame, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_scaled", col("tf") * expr("(_n_docs * 1000000L) div df"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("cf"),
        col("score_scaled"), col("rank"))
  }

  /** Hybrid retrieval: [[bm25TopDocs]]'s lexical ranking fused with an
    * embedding-cosine ranking by reciprocal-rank fusion (Cormack,
    * Clarke & Büttcher, SIGIR 2009) — the standard two-tower shape of a
    * modern retrieval/curation stack ("find documents like this probe":
    * the lexical leg catches exact-term overlap, the vector leg catches
    * paraphrase). RRF fuses RANKS, not scores, so the incomparable
    * score scales (BM25 milli vs IEEE cosine) never mix:
    *
    *   rrf_micro = Σ_legs 10⁹ div (rrfK + rank_leg)
    *
    * — an exact integer both engines compute identically; a leg that
    * missed the document contributes 0 (its rank column stays NULL in
    * the output, the honest "not in this leg's top-N" signal).
    *
    * Scale shape: each leg is its own scale-proven op ending in a
    * bounded top-N (BM25: hash-aggs + broadcast df + TakeOrdered;
    * brute-force cosine here as the exactness baseline — at corpus
    * scale swap the vector leg for [[Similarity.ivfPqTopK]], whose
    * contract is the same (id, rank) list). The fusion itself touches
    * ≤ nLex + nVec rows: one tiny full-outer join and a [[Ranking.rankTop]]
    * renumber, zero data-sized work after the legs. Ranks are total
    * orders (score desc, id) on both legs, so the fused order is
    * deterministic and the DuckDB oracle replays it cell-exact.
    *
    * `docs`/`embeddings` are joined on nothing — the caller guarantees
    * the id domains align (doc_id == vec_id); output key is `doc_id`. */
  def hybridRrf(docs: DataFrame, docIdCol: String, textCol: String,
      queryTerms: Seq[String],
      embeddings: DataFrame, vecIdCol: String, embCol: String,
      queryVec: DataFrame, queryVecIdCol: String,
      nLex: Int, nVec: Int, k: Int, rrfK: Int = 60): DataFrame = {
    require(nLex >= 1 && nVec >= 1 && k >= 1, "leg sizes and k must be >= 1")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val lex = Ranking.rankTop(
      bm25TopDocs(docs, docIdCol, textCol, queryTerms, nLex),
      Seq(col("score_milli").desc, col("doc_id")), nLex, "rank_lex")
      .select(col("doc_id").cast("long").as("doc_id"), col("rank_lex"))
    val vec = Ranking.rankTop(
      Similarity.bruteForceTopK(embeddings, vecIdCol, embCol,
        queryVec, queryVecIdCol, nVec),
      Seq(col("cos_sim").desc, col(vecIdCol)), nVec, "rank_vec")
      .select(col(vecIdCol).cast("long").as("doc_id"), col("rank_vec"))
    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
        (coalesce(expr(s"${1000000000L}L div (${rrfK}L + rank_lex)"), lit(0L)) +
          coalesce(expr(s"${1000000000L}L div (${rrfK}L + rank_vec)"), lit(0L)))
          .as("rrf_micro"))
    Ranking.rankTop(fused, Seq(col("rrf_micro").desc, col("doc_id")), k, "rank")
  }
}
