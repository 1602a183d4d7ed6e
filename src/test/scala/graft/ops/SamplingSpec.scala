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

  test("weightedSample: deterministic, weight-monotone in expectation, zero-weight excluded") {
    val weighted = docs.withColumn("w",
      when(col("doc_id") < 200, lit(8L)).otherwise(lit(1L)))
    val s1 = Sampling.weightedSample(weighted, "doc_id", col("w"), k = 100)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(weighted, "doc_id", col("w"), k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "re-run changed the sample")
    assert(s1.size == 100)
    // ids 0..199 have weight 8 vs 1: P(high-weight row beats low) per
    // pair is 8/9 — the 100-draw sample must be dominated by them (the
    // exact count is deterministic given the hash; bound it loosely)
    val nHigh = s1.count(_ < 200)
    assert(nHigh > 75, s"high-weight rows under-sampled: $nHigh/100")
    // w = 0 rows can never be drawn
    val withZero = docs.withColumn("w",
      when(col("doc_id") < 390, lit(0L)).otherwise(lit(4L)))
    val z = Sampling.weightedSample(withZero, "doc_id", col("w"), k = 100)
      .select("doc_id").as[Long].collect()
    assert(z.length == 10 && z.forall(_ >= 390))
    // NULL weight = excluded too (least() skips nulls — a raw
    // least(NULL, cap) would hand null rows the MAXIMUM weight)
    val withNull = docs.withColumn("w",
      when(col("doc_id") < 390, lit(null).cast("long")).otherwise(lit(4L)))
    val nz = Sampling.weightedSample(withNull, "doc_id", col("w"), k = 100)
      .select("doc_id").as[Long].collect()
    assert(nz.length == 10 && nz.forall(_ >= 390))
    // NULL id = excluded even when that leaves fewer than k rows
    // (a null id's draws are NULL priorities, admitted by limit otherwise)
    val withNullId = docs.withColumn("w", lit(2L))
      .withColumn("id2", when(col("doc_id") >= 395, col("doc_id")))
    val ni = Sampling.weightedSample(withNullId, "id2", col("w"), k = 100)
      .select("id2").as[Long].collect()
    assert(ni.length == 5 && ni.forall(_ >= 395))
  }

  test("weightedSample: equal weights reduce to the unweighted content-keyed top-k") {
    val w1 = Sampling.weightedSample(docs.withColumn("w", lit(1L)),
      "doc_id", col("w"), k = 50).select("doc_id").as[Long].collect().toSet
    // weight 1 = single draw = md5(id:1) ranking — independent of any
    // other column, so a projection change can't alter the sample
    val w1b = Sampling.weightedSample(
      docs.select("doc_id").withColumn("w", lit(1L)),
      "doc_id", col("w"), k = 50).select("doc_id").as[Long].collect().toSet
    assert(w1 == w1b)
  }

  test("assignSplit: exhaustive cover, growth-stable, fractions near target") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val bySplit = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == 400)
    assert(bySplit("train") > 280 && bySplit("train") < 360, bySplit.toString)
    // growth stability: the assignment of the first 100 docs is the
    // same whether or not the other 300 exist
    val small = Sampling.assignSplit(docs.where(col("doc_id") < 100),
      "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val fromFull = split.where(col("doc_id") < 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small == fromFull)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    // a fraction below 5e-7 rounds to 0 micros — its bucket would be
    // silently always-empty; must fail loudly, not quantize away
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id",
        Seq("a" -> (1.0 - 1e-9), "b" -> 1e-9))
    }
    // NULL keys have no identity to split on — they are excluded, never
    // silently dumped into the last declared split (test-set poisoning)
    val withNullKey = docs.withColumn("k2",
      when(col("doc_id") < 10, lit(null).cast("long")).otherwise(col("doc_id")))
    val ns = Sampling.assignSplit(withNullKey, "k2",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(ns.count() == 390)
    assert(ns.where(col("k2").isNull).count() == 0)
  }

  test("budgetedAssembly: each stratum covers its allocation, boundary doc kept, deterministic") {
    // 4-token docs in two equal strata: total 800 tokens per stratum;
    // sqrt weights equal → each stratum allocated budget/2
    val corpus = docs.withColumn("source",
      when(col("doc_id") % 2 === 0, "a").otherwise("b"))
    val got = Sampling.budgetedAssembly(corpus, "doc_id", "source", "text",
      budgetTokens = 400L)
    val perStratum = got.groupBy("source")
      .agg(sum("n_tokens").as("kept"), max("alloc_tokens").as("alloc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((s, (kept, alloc)) <- perStratum) {
      assert(alloc == 200L, s"$s alloc=$alloc")
      // allocation covered, never exceeded by more than the boundary doc
      assert(kept >= alloc && kept < alloc + 7, s"$s kept=$kept alloc=$alloc")
    }
    // deterministic: re-run yields the identical doc set
    val ids1 = got.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.budgetedAssembly(corpus, "doc_id", "source", "text", 400L)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("waterfillLevel: optimal integer level, edge cases, brute-force agreement") {
    // hand case: masses (10, 20, 70), budget 60 -> keep 10 and 20 whole,
    // cap the 70 at 30 (10 + 20 + 30 = 60)
    assert(Sampling.waterfillLevel(Seq(10L, 20L, 70L), 60L) == 30L)
    // everything fits -> level pins to max mass, nothing capped
    assert(Sampling.waterfillLevel(Seq(10L, 20L, 70L), 100L) == 70L)
    // budget below d * min -> uniform split
    assert(Sampling.waterfillLevel(Seq(10L, 20L, 70L), 9L) == 3L)
    assert(Sampling.waterfillLevel(Seq(5L), 3L) == 3L)
    assert(Sampling.waterfillLevel(Seq(5L, 5L), 0L) == 0L)
    // brute-force optimality: level is the MAX c with sum(min(m,c)) <= B
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val ms = Seq.fill(1 + rng.nextInt(6))(rng.nextInt(100).toLong)
      val b = rng.nextInt(300).toLong
      val got = Sampling.waterfillLevel(ms, b)
      def fill(c: Long) = ms.map(m => math.min(m, c)).sum
      assert(fill(got) <= b, s"ms=$ms b=$b got=$got overflows")
      if (got < ms.max) // not the everything-fits pin
        assert(fill(got + 1) > b, s"ms=$ms b=$b got=$got not maximal")
    }
  }

  test("waterfillAllocation: per-source caps at the level, budget respected") {
    val corpus = docs.withColumn("source",
        when(col("doc_id") % 4 === 0, lit("big"))
          .otherwise(concat(lit("small_"), (col("doc_id") % 4).cast("string"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Sampling.waterfillAllocation(corpus, "source", col("n_chars"), 5L, 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val level = got.head._4
    assert(got.forall(_._4 == level)) // one level for the whole table
    assert(got.map(_._3).sum <= got.head._5, "allocation exceeds budget")
    got.foreach { case (_, mass, alloc, lvl, _) =>
      assert(alloc == math.min(mass, lvl))
    }
  }
}
