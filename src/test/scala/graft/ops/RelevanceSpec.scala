package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "rare common common common"),
    (2L, "common common common common common common common common"),
    (3L, "rare rare common other"),
    (4L, "other other other common")
  ).toDF("doc_id", "text")

  test("bm25: a rare-term doc outranks a long common-term doc on a mixed query") {
    val got = Relevance.bm25TopDocs(docs, "doc_id", "text",
      Seq("rare", "common"), k = 4)
      .select("doc_id").as[Long].collect()
    // doc 3 has rare tf=2 (df=2 of 4) — idf dominates; doc 2 is all
    // common (df=4 → rational idf (2*0+1)*1000//9 = 111, near-zero)
    assert(got.head == 3L, got.mkString(","))
    assert(got.indexOf(3L) < got.indexOf(2L))
  }

  test("bm25: replays the documented milli ladder exactly") {
    // hand-compute doc 1's score: len=4, N=4, Ltot=20
    // rare: tf=1, df=2  -> idf=(2*2+1)*1000//5=1000
    //   lr=1000*4*4//20=800; D=1000+300+(9*800)//10=2020
    //   s=2200*1*1000//2020=1089
    // common: tf=3, df=4 -> idf=(2*0+1)*1000//9=111
    //   s=2200*3*111//(3000+300+720)=182
    val got = Relevance.bm25TopDocs(docs, "doc_id", "text",
      Seq("rare", "common"), k = 4)
      .where(col("doc_id") === 1L)
      .select("score_milli", "n_terms_hit").as[(Long, Long)].head()
    assert(got == (1089L + 182L, 2L), got.toString)
  }

  test("bm25: k caps the output and ties break on doc_id") {
    assert(Relevance.bm25TopDocs(docs, "doc_id", "text", Seq("common"), 2)
      .count() == 2L)
  }

  test("tfidf: corpus-wide terms sink below doc-specific ones") {
    val top1 = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // doc 1: common tf=3 · (4e6//4) = 3e6 beats rare 1 · (4e6//2) = 2e6
    // — idf demotes but tf still wins when 3× more frequent in-doc
    assert(top1(1L) == "common")
    assert(top1(3L) == "rare") // tf=2 · 2e6 = 4e6 beats common 1e6
    assert(top1(4L) == "other")
    assert(top1(2L) == "common") // only term present
  }

  test("tfidf: score is the documented rational ladder tf * ((N*1e6) div df)") {
    val row = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 5)
      .where(col("doc_id") === 3L && col("term") === "rare")
      .select("tf", "df", "score_scaled").as[(Long, Long, Long)].head()
    assert(row == ((2L, 2L, 2L * ((4L * 1000000L) / 2L))), row.toString)
  }

  private val embs = Seq(
    (0L, Seq(1.0f, 0.0f)),   // the query vector
    (1L, Seq(1.0f, 0.1f)),
    (2L, Seq(0.5f, 0.5f)),
    (3L, Seq(0.0f, 1.0f)),
    (4L, Seq(1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("hybridRrf: fuses both legs with the documented integer RRF ladder") {
    // lex ranks (rare+common over docs): 3,1,2,4 ; vec ranks vs [1,0]: 4,1,2,3
    val got = Relevance.hybridRrf(docs, "doc_id", "text", Seq("rare", "common"),
      embs, "vec_id", "embedding", embs.where(col("vec_id") === 0), "vec_id",
      nLex = 4, nVec = 4, k = 4)
      .select("doc_id", "rank_lex", "rank_vec", "rrf_micro", "rank")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._5)
    // doc1: lex 2 + vec 2 -> 2 * (1e9 div 62) = 32258064 — the fused top
    assert(got.head == ((1L, 2L, 2L, 32258064L, 1L)), got.mkString(","))
    // doc3 (lex 1, vec 4) and doc4 (lex 4, vec 1) tie at
    // 1e9 div 61 + 1e9 div 64 — tie breaks on doc_id
    assert(got(1) == ((3L, 1L, 4L, 16393442L + 15625000L, 2L)))
    assert(got(2) == ((4L, 4L, 1L, 16393442L + 15625000L, 3L)))
    assert(got(3)._1 == 2L)
  }

  test("hybridRrf: a doc missing from one leg keeps a NULL rank and scores the other leg only") {
    val got = Relevance.hybridRrf(docs, "doc_id", "text", Seq("rare", "common"),
      embs, "vec_id", "embedding", embs.where(col("vec_id") === 0), "vec_id",
      nLex = 4, nVec = 2, k = 4) // vec leg = {4, 1} only
      .where(col("doc_id") === 3L)
      .select("rank_lex", "rank_vec", "rrf_micro").collect().head
    assert(got.getLong(0) == 1L)
    assert(got.isNullAt(1))
    assert(got.getLong(2) == 1000000000L / 61L)
  }

  test("hybridRrf: k caps the fused output") {
    assert(Relevance.hybridRrf(docs, "doc_id", "text", Seq("rare"),
      embs, "vec_id", "embedding", embs.where(col("vec_id") === 0), "vec_id",
      nLex = 4, nVec = 4, k = 2).count() == 2L)
  }

  test("null text and null id rows drop from both scorers and from N") {
    val withNull = docs.unionByName(
      Seq((Option(9L), Option.empty[String]),
        (Option.empty[Long], Option("rare rare"))).toDF("doc_id", "text"))
    val a = Relevance.bm25TopDocs(docs, "doc_id", "text", Seq("rare"), 10).collect()
    val b = Relevance.bm25TopDocs(withNull, "doc_id", "text", Seq("rare"), 10).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
