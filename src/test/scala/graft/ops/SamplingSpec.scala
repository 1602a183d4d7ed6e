package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 400).map { i =>
    (i.toLong, s"document number $i with some content", if (i % 4 == 0) "tail" else "en")
  }.toDF("doc_id", "text", "lang")

  test("hash sampling is deterministic and content-keyed") {
    val a = Sampling.uniformSample(docs, "text", 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.uniformSample(docs, "text", 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)                       // re-run → identical sample
    assert(a.nonEmpty && a.size < 400)   // actually samples
    // repartitioning must not change the verdict (df.sample would)
    val c = Sampling.uniformSample(docs.repartition(7), "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == c)
  }

  test("rate monotonicity: a lower-rate sample is a subset of a higher-rate one") {
    val small = Sampling.uniformSample(docs, "text", 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.uniformSample(docs, "text", 0.8).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("stratified rates apply per stratum; default covers the rest") {
    val sampled = Sampling.stratifiedSample(docs, "text", "lang",
      Map("en" -> 0.25), defaultRate = 1.0)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("tail") == 100)                 // rate 1.0 keeps everything
    assert(byLang("en") > 30 && byLang("en") < 120) // ~25% of 300
  }

  test("capPerKey keeps exactly n deterministic rows per key") {
    val capped = Sampling.capPerKey(docs, "lang", "text", "doc_id", n = 10)
    val counts = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 10, "tail" -> 10))
    val again = Sampling.capPerKey(docs.repartition(5), "lang", "text", "doc_id", n = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("shuffleShard: total cover, bounded shards, contiguous positions, deterministic") {
    val sharded = Sampling.shuffleShard(docs, "doc_id", "text", nShards = 16)
    val rows = sharded.select("doc_id", "shard", "pos").collect()
    assert(rows.length == 400)                               // every row lands somewhere
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    // per-shard positions are exactly 1..count (a total order, no gaps)
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // content-keyed: partitioning must not move anything
    val again = Sampling.shuffleShard(docs.repartition(7), "doc_id", "text", 16)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("capPerKey stays deterministic when sort-key content is duplicated") {
    // identical text everywhere → u(sortKey) ties on every row; the id
    // tiebreaker must make the pick stable across partitionings
    val dupes = (0 until 200).map(i => (i.toLong, "same text", "k")).toDF("doc_id", "text", "lang")
    val a = Sampling.capPerKey(dupes, "lang", "text", "doc_id", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.capPerKey(dupes.repartition(11), "lang", "text", "doc_id", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("mixtureWeights: sqrt temperature flattens shares; budget splits exactly") {
    import spark.implicits._
    // A: 9 tokens, B: 1 token → sqrt weights 3:1 → shares 0.75/0.25
    // (proportional sampling would give 0.9/0.1 — the α=0.5 flattening)
    val docs = Seq(
      ("A", "t t t t t t t t t"),
      ("B", "t")).toDF("source", "text")
    val got = Sampling.mixtureWeights(docs, "source", "text", budgetTokens = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(got("A") == ((1L, 9L, 3000000L, 0.75, 750L)))
    assert(got("B") == ((1L, 1L, 1000000L, 0.25, 250L)))
  }
}
