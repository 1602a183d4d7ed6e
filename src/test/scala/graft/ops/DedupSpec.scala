package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different text about spark engines here")
  ).toDF("doc_id", "text")

  test("leak-safe split: a doc and its near-duplicate always land in the SAME split") {
    val clusters = Dedup.resolveMinhashDups(docs, "doc_id", "text", minEstJaccard = 1.0)
      .select(col("doc_id"), col("cluster_id"))
    val assigned = Sampling.assignSplit(clusters, "cluster_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // structural invariant: split is a function of cluster_id
    val straddling = assigned.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("k")).where(col("k") > 1).count()
    assert(straddling == 0L)
    // and the exact-dup pair (docs 1 and 2) shares one split
    val s12 = assigned.where(col("doc_id").isin(1L, 2L))
      .select("split").distinct().count()
    assert(s12 == 1L)
  }

  test("exact dedup keeps min id per distinct text with copy counts") {
    val got = Dedup.exact(docs, "doc_id", Seq("text"))
      .select("keep_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("minhash: identical docs share full signatures; near dups agree on most lanes") {
    val sigs = Dedup.signatures(docs, "doc_id", "text", shingleN = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val agree34 = sigs(3L).zip(sigs(4L)).count { case (a, b) => a == b }
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree13 > agree34) // near dup closer than unrelated
  }

  test("minhashCandidates surfaces the dup pair with estJaccard 1.0") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L } ||
      pairs.forall { case ((a, b), j) => j <= 1.0 })
  }

  test("verifyJaccard computes exact set arithmetic for supplied pairs only") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.verifyJaccard(docs, "doc_id", "text", pairs, shingleN = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("jaccard")))).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L))) // only the asked pairs
    assert(got((1L, 2L)) == ((7L, 7L, 7L, 1.0)))            // identical: 7 trigrams
    // doc3 swaps one word -> loses the 2 trigrams containing "lazy"
    assert(got((1L, 3L)) == ((5L, 7L, 7L, 5.0 / 9.0)))
    assert(got((1L, 4L))._1 == 0L && got((1L, 4L))._4 == 0.0) // zero-overlap pair kept
    // duplicated input pairs must not double-count shared grams
    val dup = Seq((1L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val viaDup = Dedup.verifyJaccard(docs, "doc_id", "text", dup, shingleN = 3).collect()
    assert(viaDup.length == 1 && viaDup(0).getAs[Long]("n_shared") == 5L)
  }

  test("verifyJaccardManaged matches verifyJaccard and releases the pair cache entry") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard")))).toMap
    spark.catalog.clearCache() // forked suites run sequentially — safe
    val want = asMap(Dedup.verifyJaccard(docs, "doc_id", "text", pairs).collect())
    spark.catalog.clearCache()
    val managed = Dedup.verifyJaccardManaged(docs, "doc_id", "text", pairs)
    // the cache registry is back to empty BEFORE the caller consumes the
    // result — only the checkpoint blocks (owned by `managed`) remain
    assert(spark.sharedState.cacheManager.isEmpty,
      "managed verify left a cache entry behind")
    assert(asMap(managed.collect()) == want)
  }

  test("simhash: identical docs → hamming 0; unrelated docs → large hamming") {
    val fps = Dedup.simhashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(4L)) > 10)
    val candidates = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candidates.contains((1L, 2L)))
  }

  test("ngram Jaccard: identity = 1.0, known overlap computes exactly") {
    val query = docs.where(col("doc_id") === 1)
    val got = Dedup.ngramJaccardVs(docs, "doc_id", "text", query, "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got(1L)._3 == 1.0 && got(2L)._3 == 1.0)
    // doc3 differs in one word -> loses 2 of 8 distinct bigrams ("the lazy","lazy dog")
    val (inter, self, j) = got(3L)
    assert(self == 8 && inter == 6)
    assert(math.abs(j - 6.0 / 10.0) < 1e-15) // |A∪B| = 8+8-6
    assert(got(4L)._1 == 0 && got(4L)._3 == 0.0)
  }

  test("dupClusters: chains collapse to the min id; disjoint components stay apart") {
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; singleton edge-less docs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    spark.catalog.clearCache() // forked suites run sequentially — safe
    val labels = Dedup.dupClusters(pairs)
    // managed lifetime: the returned labels are checkpoint-backed — the
    // cache registry is empty BEFORE the caller consumes the result, so
    // a bench-style re-run of the identical plan can never hit this
    // call's cached generations (warm-cache flattering)
    assert(spark.sharedState.cacheManager.isEmpty,
      "dupClusters left a cache entry behind")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("incrementalDedup: re-crawl → dup_of original, novel → is_new, short docs by exact text, null text new") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "completely different content here now"),
      (3L, "ab")                                        // short: no shingles
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (100L, "the quick brown fox jumps over the dog"), // exact dup of 1
      (101L, "ab"),                                     // short dup via exact text
      (102L, "totally novel text never seen anywhere"), // new
      (103L, null.asInstanceOf[String])                 // no identity → new
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(existing, incoming, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))).toMap
    assert(got == Map(
      100L -> ((Some(1L), false)),
      101L -> ((Some(3L), false)),
      102L -> ((None, true)),
      103L -> ((None, true))))
  }

  test("incrementalDedup law: a corpus deduped against itself reports every non-null doc as a dup of its class min") {
    // self-consistency: when incoming == existing, nothing is new (every
    // doc matches at least itself) and dup_of is the min id of the doc's
    // identity class — never larger than the doc's own id
    val self = Dedup.incrementalDedup(docs, docs, "doc_id", "text").collect()
    assert(self.forall(!_.getBoolean(2)), "self-dedup reported a new doc")
    assert(self.forall(r => r.getLong(1) <= r.getLong(0)),
      "dup_of must be the class min, never above the doc's own id")
  }

  test("keepBestPerCluster keeps the highest score, breaks ties on min id, singletons keep themselves") {
    val labeled = Seq(
      (1L, 1L, 5L), (2L, 1L, 9L), (3L, 1L, 9L), // cluster 1: 2 and 3 tie on score 9 -> 2 wins
      (10L, 10L, 1L)                            // singleton keeps itself
    ).toDF("doc_id", "cluster_id", "score")
    val got = Dedup.keepBestPerCluster(labeled, "doc_id", "cluster_id", "score")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 10L -> true))
    // NULL scores: a null never beats a scored doc; an all-null cluster
    // falls back to the min-id keep (is_kept stays a real boolean,
    // never three-valued NULL)
    val withNulls = Seq(
      (1L, 1L, Some(5L)), (2L, 1L, None),       // null loses to scored
      (20L, 20L, None), (21L, 20L, None)        // all-null: min id kept
    ).toDF("doc_id", "cluster_id", "score")
    val gotN = Dedup.keepBestPerCluster(withNulls, "doc_id", "cluster_id", "score")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(gotN == Map(1L -> true, 2L -> false, 20L -> true, 21L -> false))
    // STRING ids must work: the earlier arithmetic-negation tie-break
    // cast a string id to double NULL, making is_kept NULL fleet-wide
    val strIds = Seq(
      ("a", 1L, 9L), ("b", 1L, 9L), ("c", 1L, 5L)
    ).toDF("doc_id", "cluster_id", "score")
    val gotS = Dedup.keepBestPerCluster(strIds, "doc_id", "cluster_id", "score")
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(gotS == Map("a" -> true, "b" -> false, "c" -> false))
    // Long.MinValue id must not wrap (-MinValue == MinValue overflow):
    // it is the MINIMUM id, so it wins its tie
    val minIds = Seq(
      (Long.MinValue, 1L, 9L), (5L, 1L, 9L)
    ).toDF("doc_id", "cluster_id", "score")
    val gotM = Dedup.keepBestPerCluster(minIds, "doc_id", "cluster_id", "score")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(gotM == Map(Long.MinValue -> true, 5L -> false))
  }

  test("dupClusters strict mode throws when a chain outruns maxIter") {
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b") // diameter 5
    intercept[IllegalStateException] {
      Dedup.dupClusters(chain, maxIter = 2)
    }
    // non-strict returns the partial labels instead
    val partial = Dedup.dupClusters(chain, maxIter = 2, strict = false)
    assert(partial.count() == 6)
  }

  test("dupClusters deep-component path: a diameter-25 chain throws at the default cap, recovers non-strict, resolves with maxIter raised") {
    // The boilerplate-chained-crawl shape: 26 docs in one path. Three
    // contracts at once: (1) the default cap fails LOUDLY, with the
    // remedies in the message; (2) strict = false yields partial but
    // monotone labels (every label ≤ own id — min-propagation never
    // invents ids); (3) maxIter past the diameter yields exact labels
    // WITHOUT exponential plan growth — each round localCheckpoints,
    // so 25+ rounds of double-self-reference stay constant-size plans
    // (a diameter-9 chain OOM'd the driver under the old cache() form
    // before this was pinned).
    val chain = (1L to 25L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalStateException] {
      Dedup.dupClusters(chain) // default maxIter = 20 < diameter 25
    }
    assert(ex.getMessage.contains("raise maxIter") &&
      ex.getMessage.contains("strict = false"), ex.getMessage)
    val partial = Dedup.dupClusters(chain, strict = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial.size == 26)
    assert(partial.forall { case (doc, lbl) => lbl <= doc && lbl >= 1L })
    val exact = Dedup.dupClusters(chain, maxIter = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == (1L to 26L).map(_ -> 1L).toMap)
    assert(spark.sharedState.cacheManager.isEmpty,
      "dupClusters left a cache entry behind")
  }

  test("dupClustersContract matches dupClusters on mixed components and handles reversed/duplicate pairs") {
    // same fixtures as the propagation tests, plus noise the API allows:
    // a pair listed both ways and a repeated pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 3L), (10L, 11L),
      (10L, 11L), (20L, 21L), (21L, 22L), (7L, 8L)).toDF("doc_a", "doc_b")
    val viaContract = Dedup.dupClustersContract(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPropagation = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaContract == viaPropagation)
    assert(viaContract == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 7L -> 7L, 8L -> 7L))
  }

  test("dupClustersAuto: shallow graphs resolve inside the propagation budget; a deep chain falls over to contraction") {
    // one API, both regimes — the caller no longer guesses the diameter.
    // Shallow: the mixed fixture converges within the default budget and
    // returns propagation's labels.
    val shallow = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val gotShallow = Dedup.dupClustersAuto(shallow)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotShallow == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // Deep: a diameter-500 chain exhausts any practical propagation
    // budget — strict dupClusters throws here (asserted below), but the
    // front door falls over to contraction and returns exact labels.
    val chain = (1L to 500L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val gotDeep = Dedup.dupClustersAuto(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDeep == (1L to 501L).map(_ -> 1L).toMap)
    assert(spark.sharedState.cacheManager.isEmpty,
      "dupClustersAuto left a cache entry behind")
  }

  test("dupClustersContract: a diameter-500 chain converges in O(log d) rounds where propagation cannot") {
    // the deep-component scale case from the round-9 verdict: min-label
    // needs 500 rounds (propagation throws at any practical cap);
    // contraction halves path lengths per round, so the DEFAULT cap of
    // 30 must be far more than enough — and labels are exact, with no
    // cache-registry residue (the managed-lifetime law)
    val chain = (1L to 500L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] { Dedup.dupClusters(chain) }
    val labels = Dedup.dupClustersContract(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (1L to 501L).map(_ -> 1L).toMap)
    assert(spark.sharedState.cacheManager.isEmpty,
      "dupClustersContract left a cache entry behind")
  }

  test("spanDupCoverage: sliding spans catch shared passages at any alignment; counts and coverage are exact") {
    // doc 1 and 2 share an 8-token passage at DIFFERENT offsets (chunk
    // dedup with fixed windows misses this); doc 3 is 8 tokens of
    // unique text; doc 4 too short to host a span; doc 5 null text
    val shared = "one two three four five six seven eight"
    val fixture = Seq(
      (1L, s"$shared tail1 tail2"),                    // span at offset 0
      (2L, s"lead1 lead2 lead3 $shared"),              // same span at offset 3
      (3L, "unique tokens that never repeat anywhere else ever"),
      (4L, "short doc"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Dedup.spanDupCoverage(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: 10 tokens, ONE duplicated span (the shared 8-gram at start
    // 0 — "two three...tail1" etc. contain tail tokens so don't repeat),
    // 8 covered positions
    assert(got(1L) == ((10L, 1L, 8L, 0.8)))
    assert(got(2L) == ((11L, 1L, 8L, 8.0 / 11.0)))
    assert(got(3L) == ((8L, 0L, 0L, 0.0)))
    assert(got(4L) == ((2L, 0L, 0L, 0.0)))
    assert(!got.contains(5L)) // null text excluded, as documented
  }

  test("spanDupCoverage: overlapping duplicated spans union their covered positions, not sum them") {
    // docs share a 9-token passage → each hosts TWO duplicated 8-spans
    // whose covered ranges overlap in 7 positions; coverage must count
    // the union (9), never 16
    val nine = "a b c d e f g h i"
    val fixture = Seq((1L, s"$nine x"), (2L, s"y $nine")).toDF("doc_id", "text")
    val got = Dedup.spanDupCoverage(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((10L, 2L, 9L)))
    assert(got(2L) == ((10L, 2L, 9L)))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("spanDedupRewrite: the span's min-doc owner keeps its text; others drop covered positions in order") {
    val shared = "one two three four five six seven eight"
    val fixture = Seq(
      (1L, s"$shared tail1 tail2"),       // owner: untouched
      (2L, s"lead1 lead2 lead3 $shared"), // loses the 8 covered tokens
      (3L, "unique tokens that never repeat anywhere else ever"),
      (4L, "short doc"),                  // < spanN: can't host a span
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedupRewrite(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((10L, 10L, md5hex(s"$shared tail1 tail2"))))
    assert(got(2L) == ((11L, 3L, md5hex("lead1 lead2 lead3"))))
    assert(got(3L) == ((8L, 8L,
      md5hex("unique tokens that never repeat anywhere else ever"))))
    assert(got(4L) == ((2L, 2L, md5hex("short doc"))))
    assert(!got.contains(5L)) // null text excluded, as documented
  }

  test("spanDedupRewrite: a fully-duplicated non-owner empties to md5('') and kept tokens splice around gaps") {
    val t = "a b c d e f g h"
    val fixture = Seq(
      (1L, t), (2L, t),                 // doc 2 empties entirely
      (3L, s"pre $t post")              // interior gap: pre + post splice
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedupRewrite(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((8L, 8L, md5hex(t))))
    assert(got(2L) == ((8L, 0L, md5hex(""))))
    assert(got(3L) == ((10L, 2L, md5hex("pre post"))))
  }

  test("selfDupRewrite: later in-doc occurrences drop, the first stays; cross-doc repeats are untouched") {
    val rep = "x x x x x x x x x x"          // 10 tokens, one repeated 8-span
    val shared = "one two three four five six seven eight"
    val fixture = Seq(
      (1L, rep),                             // spans at 0/1/2 identical → keep pos 0 only
      (2L, shared),                          // unique within doc
      (3L, shared)                           // duplicate of doc 2 — but ACROSS docs: kept
    ).toDF("doc_id", "text")
    val got = Dedup.selfDupRewrite(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((10L, 1L, md5hex("x"))))
    assert(got(2L) == ((8L, 8L, md5hex(shared))))
    assert(got(3L) == ((8L, 8L, md5hex(shared))))
  }

  test("decontaminate: train docs sharing >= 2 grams with any eval doc are flagged; clean and null-text docs keep") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota"
    val train = Seq(
      (1L, s"$passage lead tail"),                          // 2 shared 8-grams with eval 100
      (2L, "clean text with no benchmark overlap at all whatsoever"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, passage)).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((1L, 2L, false))) // one eval doc, two shared grams
    assert(got(2L) == ((0L, 0L, true)))
    assert(got(3L) == ((0L, 0L, true))) // no grams -> keeps, still listed
  }

  test("sourceOverlapMatrix: cluster-level counts, diagonal needs a second same-source copy") {
    val t1 = "one two three four"
    val fixture = Seq(
      (1L, t1, "sA"), (2L, t1, "sB"), (3L, t1, "sA"),   // cluster of 3 across sA/sB
      (4L, "unique text here now", "sB")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlapMatrix(fixture, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // sA: both docs have a dup in sB's copy and in each other
    assert(got(("sA", "sB")) == ((2L, 2L)))
    assert(got(("sA", "sA")) == ((2L, 2L)))
    // sB: doc 2 has dups in sA; doc 4 is a singleton → no sB/sB row
    assert(got(("sB", "sA")) == ((2L, 1L)))
    assert(!got.contains(("sB", "sB")))
  }

  test("resolveMinhashDups keeps one canonical doc per near-dup cluster") {
    val resolved = Dedup.resolveMinhashDups(docs, "doc_id", "text", minEstJaccard = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byDoc = resolved.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byDoc(1L) == ((1L, true)))   // canonical of the exact-dup cluster
    assert(byDoc(2L) == ((1L, false)))  // folded into doc 1
    assert(byDoc(4L) == ((4L, true)))   // no candidates: keeps itself
    assert(resolved.count(_._3) == resolved.map(_._2).distinct.length)
  }

  test("minhash candidates: no k-lane minhash evaluation inside a Filter node") {
    // the short-doc exclusion must filter on the raw token count, not on
    // the signature attribute — a sig-based predicate is pushed below the
    // projection and re-evaluates the full minhash per row
    val plan = Dedup.minhashCandidates(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    val offending = plan.linesIterator
      .filter(l => l.trim.startsWith("Filter") && l.contains("graft_minhash"))
    assert(offending.isEmpty, s"minhash inside Filter:\n$plan")
  }

  test("bucket cap drops a degenerate bucket instead of self-joining it quadratically") {
    val boiler = (1L to 1000L)
      .map(i => (i, "exactly the same boilerplate text for every single row"))
      .toDF("doc_id", "text")
    // every doc lands in ONE bucket per band; the cap drops them all →
    // zero candidate pairs instead of 4 × 10^6/2 pair rows
    assert(Dedup.minhashCandidates(boiler, "doc_id", "text", maxBucketSize = 100).isEmpty)
    val overflow = Dedup.minhashBucketOverflow(boiler, "doc_id", "text", maxBucketSize = 100)
      .collect().map(_.getAs[Long]("n_members"))
    assert(overflow.length == 4 && overflow.forall(_ == 1000L))
    // same guard on the simhash path
    assert(Dedup.simhashCandidates(boiler, "doc_id", "text", maxBucketSize = 100).isEmpty)
    assert(Dedup.simhashBucketOverflow(boiler, "doc_id", "text", maxBucketSize = 100)
      .collect().map(_.getAs[Long]("n_members")).forall(_ == 1000L))
    // an admitting cap returns the pairs (spot-check on a small corpus)
    assert(Dedup.minhashCandidates(docs, "doc_id", "text", maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
  }

  test("resolveMinhashDups clusters mass duplicates even when the bucket cap drops all LSH pairs") {
    // 300 identical long docs overflow every band bucket at cap 100 —
    // LSH contributes zero edges, the exact-text pass must still fold
    // them into one cluster
    val flood = (1L to 300L)
      .map(i => (i, "the same long boilerplate sentence repeated across every document"))
      .toDF("doc_id", "text")
    val resolved = Dedup.resolveMinhashDups(flood, "doc_id", "text",
        minEstJaccard = 0.9, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(resolved.forall(_._2 == 1L))
    assert(resolved.count(_._3) == 1)
  }

  test("resolveMinhashDups folds byte-identical short docs via the exact-text pass") {
    val tiny = Seq(
      (1L, "hi there"), (2L, "hi there"),          // < shingleN tokens, identical
      (3L, "bye now"),                             // < shingleN tokens, unique
      (4L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val byDoc = Dedup.resolveMinhashDups(tiny, "doc_id", "text", minEstJaccard = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(byDoc(1L) == ((1L, true)))
    assert(byDoc(2L) == ((1L, false))) // identical short doc folded into 1
    assert(byDoc(3L) == ((3L, true)))
    assert(byDoc(4L) == ((4L, true)))
  }

  test("contamination scan finds planted train/eval n-gram overlap, caps boilerplate") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"  // 8 tokens → one 8-gram
    val train = Seq(
      (1L, s"intro words here $shared trailing content one"),
      (2L, "completely unrelated training document with other content words"),
      (3L, s"another doc embedding $shared and more after it")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, s"eval set doc containing $shared inside its body"),
      (101L, "clean evaluation document nothing shared at all here")).toDF("doc_id", "text")
    val hits = Dedup.contaminationScan(train, eval_, "doc_id", "text",
        shingleN = 8, minSharedGrams = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 100L), (3L, 100L)))
    // a gram above the df cap is dropped: with cap 1 the shared gram
    // (df 2 on the train side) no longer produces pairs
    assert(Dedup.contaminationScan(train, eval_, "doc_id", "text",
      shingleN = 8, minSharedGrams = 1, maxGramDf = 1).isEmpty)
    val overflow = Dedup.contaminationGramOverflow(train, "doc_id", "text",
        shingleN = 8, maxGramDf = 1)
      .collect().map(_.getAs[Long]("n_members"))
    assert(overflow.nonEmpty && overflow.forall(_ == 2L))
  }

  test("shingles of a doc shorter than n are empty, not an error") {
    val tiny = Seq((1L, "hi")).toDF("doc_id", "text")
    val sig = Dedup.signatures(tiny, "doc_id", "text", shingleN = 3, numHashes = 4)
      .collect()(0).getSeq[Long](1)
    assert(sig.forall(_ == Long.MaxValue)) // empty-set sentinel, deterministic
  }

  test("chunkDedupStats: global first occurrence wins, per-doc tallies") {
    // doc 1: chunks [a b] [c d]; doc 2: chunks [c d] [e f]; doc 3: [a b]
    // first occurrences: (1,0) (1,1) (2,1) — doc2 chunk0 and doc3 chunk0 removed
    val docs = Seq(
      (1L, "a b c d"), (2L, "c d e f"), (3L, "a b")).toDF("doc_id", "text")
    val got = Dedup.chunkDedupStats(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 0L)),
      2L -> ((2L, 1L, 1L)),
      3L -> ((1L, 0L, 1L))))
    // deterministic under repartitioning (window order is total)
    val again = Dedup.chunkDedupStats(docs.repartition(5), "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == got)
  }

  test("chunkDedupStats: maxChunkDf caps boilerplate chunks, audited not silent") {
    // "x y" is corpus-wide boilerplate (df 3); "a b"/"c d" are normal
    val docs = Seq(
      (1L, "x y a b"), (2L, "x y c d"), (3L, "x y")).toDF("doc_id", "text")
    def tallies(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // at the default cap the guard is inert: same tallies as ever
    assert(tallies(Dedup.chunkDedupStats(docs, "doc_id", "text", 2)) == Map(
      1L -> ((2L, 2L, 0L)), 2L -> ((2L, 1L, 1L)), 3L -> ((1L, 0L, 1L))))
    // cap 2 < df 3: every "x y" copy leaves the tallies; doc 3, which is
    // nothing but boilerplate, drops out of the output entirely
    assert(tallies(Dedup.chunkDedupStats(docs, "doc_id", "text", 2,
      maxChunkDf = 2)) == Map(1L -> ((1L, 1L, 0L)), 2L -> ((1L, 1L, 0L))))
    // and the drop is audited, not silent: one overflowing hash, df 3
    val ovf = Dedup.chunkOverflow(docs, "doc_id", "text", 2, maxChunkDf = 2)
      .collect()
    assert(ovf.length == 1 && ovf(0).getAs[Long]("n_members") == 3L)
    assert(Dedup.chunkOverflow(docs, "doc_id", "text", 2).isEmpty)
  }

  test("corpusDiff classifies added/removed/changed/unchanged with token deltas; null text is a changed-state, not a hole") {
    val v1 = Seq(
      (1L, "alpha beta"), (2L, "gamma"), (3L, "delta eps"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "alpha beta"),          // unchanged
      (2L, "gamma extended here"), // changed, +2 tokens
      (4L, "now has text"),        // null -> text: changed, +3 tokens
      (5L, "brand new doc")        // added, +3 tokens
    ).toDF("doc_id", "text")       // 3 removed (-2 tokens)
    val got = Dedup.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("unchanged", 0L)))
    assert(got(2L) == (("changed", 2L)))
    assert(got(3L) == (("removed", -2L)))
    assert(got(4L) == (("changed", 3L)))
    assert(got(5L) == (("added", 3L)))
  }

  test("autoBands: integer S-curve rule — knife edges, fallback, monotone in the target") {
    // (1/4)^(1/4) = 0.70710678…: target 0.71 admits 4-row bands, 0.70
    // does not — the centi-quantized BigInt comparison resolves the
    // knife edge exactly where IEEE pow() could land on either side
    assert(Dedup.autoBands(16, 0.71) == 4)
    assert(Dedup.autoBands(16, 0.70) == 8)
    assert(Dedup.autoBands(16, 0.5) == 8)   // knee (1/8)^(1/2) ≈ 0.354
    assert(Dedup.autoBands(16, 0.99) == 2)  // knee (1/2)^(1/8) ≈ 0.917
    // even r=1 overshoots a very low target → highest-recall fallback
    assert(Dedup.autoBands(16, 0.05) == 16)
    // more bands = more recall: as the target rises the rule must move
    // monotonically toward fewer, longer bands — for every hash budget
    for (k <- Seq(4, 8, 16, 32, 64)) {
      val seq = (1 to 99).map(t => Dedup.autoBands(k, t / 100.0))
      assert(seq.zip(seq.tail).forall { case (a, b) => b <= a },
        s"bands not monotone for numHashes=$k: $seq")
      assert(seq.forall(b => k % b == 0))
    }
  }

  test("softDedupWeights: 1/|cluster| over the threshold-1.0 structure; short docs fold by exact text") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"), // sig-identical triple
      (4L, "x y"), (5L, "x y"),                                // short: exact-text pair
      (6L, "p q r s t u")                                      // unique
    ).toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 3L, 1.0 / 3)) && got(2L) == ((1L, 3L, 1.0 / 3))
      && got(3L) == ((1L, 3L, 1.0 / 3)))
    assert(got(4L) == ((4L, 2L, 0.5)) && got(5L) == ((4L, 2L, 0.5)))
    assert(got(6L) == ((6L, 1L, 1.0)))
  }

  test("containmentVerify: a contained doc scores 1.0 where Jaccard is diluted; direction named; integer rule") {
    // doc 2 = doc 1 plus a trailing token: grams(1) ⊂ grams(2), so
    // containment = 1.0 while jaccard = 3/4; doc 3 shares nothing
    val qdocs = Seq(
      (1L, "a b c d e"),           // 3 shingles
      (2L, "a b c d e z"),         // 4 shingles, superset of doc 1's
      (3L, "p q r s t u")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(qdocs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 16, minEstJaccard = 0.0)
    val got = Dedup.containmentVerify(qdocs, "doc_id", "text", pairs,
        minContainMilli = 900)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getBoolean(6), if (r.isNullAt(7)) -1L else r.getLong(7)))).toMap
    val p12 = got((1L, 2L))
    assert(p12 == ((3L, 3L, 4L, 1.0, true, 1L)),
      s"doc 1 is fully contained in doc 2 and must be named: $got")
    // at 900 milli a 2/3 overlap must NOT flag: integer rule
    // 2*1000 < 3*900
    val qdocs2 = Seq((1L, "a b c d e"), (2L, "a b c d f z")).toDF("doc_id", "text")
    val pairs2 = Dedup.minhashCandidates(qdocs2, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 16, minEstJaccard = 0.0)
    val got2 = Dedup.containmentVerify(qdocs2, "doc_id", "text", pairs2,
        minContainMilli = 900)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(6), r.isNullAt(7)))).toMap
    got2.get((1L, 2L)).foreach { case (flag, nullDoc) =>
      assert(!flag && nullDoc, s"partial overlap must not flag at 900: $got2")
    }
  }

  test("editVerifiedPairs: exact dup verifies at lev 0; one-char typo at lev 1; integer keep rule") {
    // docs 1/2 byte-identical (candidate guaranteed: identical
    // signatures), doc 3 one substitution away — LSH recall for the
    // near pair is checked below with the generous 16-band dial
    val got = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        minSimMilli = 900, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5),
          r.getBoolean(6)))).toMap
    // "the quick brown fox jumps over the lazy dog" = 43 chars
    assert(got((1L, 2L)) == ((0L, 43L, 1.0, true, true)))
    // lazy -> sleepy: lev 4 vs max_len 45; sim = 41/45 ≈ 0.911 ≥ 0.9
    val near12 = got.get((1L, 3L)).orElse(got.get((2L, 3L)))
    assert(near12.exists(v => v._1 == 4L && v._2 == 45L && v._4 && v._5),
      s"near pair must verify as a dup at 900 milli: $got")
    // at 950 milli the same pair fails the integer keep rule:
    // (45-4)*1000 = 41000 < 45*950 = 42750
    val strict = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        minSimMilli = 950, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(5)).toMap
    assert(strict((1L, 2L)) && near12.isDefined &&
      !strict.getOrElse((1L, 3L), strict((2L, 3L))))
  }

  test("editVerifiedPairs: the maxChars cap emits verified=false with NULL lev, never a silent verdict") {
    val long = ("tok " * 2000).trim // 4 tokens * 2000 = 7999 chars
    val docs2 = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val capped = Dedup.editVerifiedPairs(docs2, "doc_id", "text",
        maxChars = 100).collect()
    assert(capped.length == 1)
    val r = capped.head
    assert(!r.getBoolean(6) && r.isNullAt(2) && r.isNullAt(4) && r.isNullAt(5),
      s"over-cap pair must be explicitly unverified: $r")
    assert(r.getLong(3) == 7999L)
    // under a big-enough cap the same pair verifies at lev 0
    val ok = Dedup.editVerifiedPairs(docs2, "doc_id", "text",
        maxChars = 8000).collect().head
    assert(ok.getBoolean(6) && ok.getLong(2) == 0L && ok.getBoolean(5))
  }

  test("boilerplateRewrite: df-threshold removes ALL copies (incl. the first), reconstruction is order-exact") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val header = "h1 h2 h3 h4 h5 h6 h7 h8" // one full 8-token chunk
    val docs = Seq(
      (1L, s"$header a b"),
      (2L, s"$header c d"),
      (3L, "e f"),
      (4L, header) // all-boilerplate doc
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateRewrite(docs, "doc_id", "text",
        chunkTokens = 8, minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    // the header appears in 3 docs -> boilerplate, removed EVERYWHERE
    // (doc 1's first copy too — the semantics d24's first-wins keeps)
    assert(got(1L) == ((2L, 1L, md5hex("a b"))))
    assert(got(2L) == ((2L, 1L, md5hex("c d"))))
    assert(got(3L) == ((1L, 0L, md5hex("e f"))))
    // an all-boilerplate doc pins to md5("") — not NULL, not absent
    assert(got(4L) == ((1L, 1L, md5hex(""))))
    // below the threshold nothing is boilerplate
    val none = Dedup.boilerplateRewrite(docs, "doc_id", "text",
        chunkTokens = 8, minDocs = 4)
      .as[(Long, Long, Long, String)].collect()
    assert(none.forall(_._3 == 0L))
    assert(none.find(_._1 == 1L).get._4 == md5hex(s"$header a b"))
  }

  private def bruteJaccardPairs(docs: Seq[(Long, String)], n: Int,
      thetaPct: Int): Set[(Long, Long)] = {
    def grams(s: String) = s.split(" ").sliding(n).map(_.mkString(" ")).toSet
    (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      ga = grams(ta); gb = grams(tb)
      i = (ga intersect gb).size
      if ga.nonEmpty && gb.nonEmpty && 100L * i >= thetaPct.toLong * (ga.size + gb.size - i)
    } yield (a, b)).toSet
  }

  test("prefixFilterPairs: equals brute-force exact-threshold pairs (no false negatives, no false positives)") {
    val fix = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),   // j(1,2) = 3/5 = 0.6
      (3L, "a b c d e f"),   // exact dup of 1 -> j = 1.0
      (4L, "x y z w q r"),   // disjoint from all
      (5L, "a b c q r s")    // low overlap with 1
    )
    val df = fix.toDF("doc_id", "text")
    for (theta <- Seq(50, 60, 61, 100)) {
      val got = Dedup.prefixFilterPairs(df, "doc_id", "text",
        shingleN = 3, thetaPct = theta)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == bruteJaccardPairs(fix, 3, theta), s"theta=$theta got=$got")
    }
    // boundary: j(1,2) = 0.6 exactly — kept at 60 (>=), dropped at 61
    assert(Dedup.prefixFilterPairs(df, "doc_id", "text", 3, 60)
      .where(col("doc_a") === 1L && col("doc_b") === 2L).count() == 1L)
    assert(Dedup.prefixFilterPairs(df, "doc_id", "text", 3, 61)
      .where(col("doc_a") === 1L && col("doc_b") === 2L).count() == 0L)
  }

  test("prefixFilterPairs: jacc_ppm is the exact integer ladder; maxPostings cap drops pairs and the audit reports it") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")
    val row = Dedup.prefixFilterPairs(df, "doc_id", "text", 3, 50)
      .select("n_shared", "n_a", "n_b", "jacc_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((3L, 4L, 4L, 3L * 1000000L / 5L)))
    // cap at 1: docs 1 and 2 share every prefix gram (df-2 grams rank
    // first), so every shared posting list has 2 entries > 1 -> dropped
    assert(Dedup.prefixFilterPairs(df, "doc_id", "text", 3, 50,
      maxPostings = 1).count() == 0L)
    val audit = Dedup.prefixFilterOverflow(df, "doc_id", "text", 3, 50,
      maxPostings = 1).collect()
    assert(audit.nonEmpty && audit.forall(_.getLong(1) == 2L))
    // and the uncapped audit is empty — the law's precondition holds
    assert(Dedup.prefixFilterOverflow(df, "doc_id", "text", 3, 50).isEmpty)
  }

  test("noveltyScore: exact ppm of grams absent from the reference; too-short and all-known docs behave") {
    import spark.implicits._
    val ref = Seq((0L, "a b c d")).toDF("doc_id", "text") // grams: "a b", "b c", "c d"
    val cand = Seq(
      (1L, "a b c"),   // grams {a b, b c} — both known -> 0 ppm
      (2L, "x y z"),   // grams {x y, y z} — both new -> 1000000 ppm
      (3L, "a b x y"), // grams {a b, b x, x y} — 2 of 3 new -> 666666 ppm
      (4L, "solo")     // < n tokens: no grams, dropped
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyScore(cand, ref, "doc_id", "text", shingleN = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 0L, 0L),
      (2L, 2L, 2L, 1000000L),
      (3L, 3L, 2L, 666666L)), s"got $got")
    // repeated grams score ONCE (distinct-set semantics, the d11 rule)
    val rep = Seq((9L, "x y x y x y")).toDF("doc_id", "text")
    val one = Dedup.noveltyScore(rep, ref, "doc_id", "text", shingleN = 2)
      .as[(Long, Long, Long, Long)].head()
    assert(one == ((9L, 2L, 2L, 1000000L)), s"got $one") // distinct set {x y, y x}
  }

  test("ngramPrecisionVerify: multiset clipping counts repeats, capped at the reference's multiplicity") {
    import spark.implicits._
    // doc 1 repeats "a b" 3x (grams: a b, b a, a b, b a, a b);
    // doc 2 has it once (grams: a b, b c); doc 3 shares nothing
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c"),
      (3L, "x y z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.ngramPrecisionVerify(docs, "doc_id", "text", pairs,
        shingleN = 2)
      .select(col("doc_a"), col("doc_b"), col("n_clip"), col("n_a"),
        col("n_b"), col("prec_a_ppm"), col("prec_b_ppm"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // pair (1,2): shared gram "a b": min(3, 1) = 1 -> clip 1 of 5 vs 1 of 2
    // pair (1,3): nothing shared -> 0 (left-join survival, the d15 rule)
    assert(got == Set(
      (1L, 2L, 1L, 5L, 2L, 200000L, 500000L),
      (1L, 3L, 0L, 5L, 2L, 0L, 0L)), s"got $got") // doc 3: 2 bigram slots
    // distinct-set Jaccard cannot tell the 3x repeat from 1x — the
    // clipped precision is the signal this op adds
    val j = Dedup.verifyJaccard(docs, "doc_id", "text", pairs, shingleN = 2)
      .where(col("doc_a") === 1L && col("doc_b") === 2L)
      .select(col("n_shared")).as[Long].head()
    assert(j == 1L) // sets: {a b, b a} ∩ {a b, b c} = {a b}
    spark.catalog.clearCache() // verifyJaccard pins its pair set
  }
}
