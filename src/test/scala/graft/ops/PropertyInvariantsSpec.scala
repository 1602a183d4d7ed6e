package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import java.sql.Timestamp

/** Property-style invariants over ScalaCheck-generated corpora — the
  * algebraic laws the DuckDB oracle can't express because they hold for
  * EVERY input, not one fixture: conservation laws of the dedup tallies,
  * monotonicity of funnel stages, the debounce verdict definition, and
  * chunking as a partition of the token sequence. Generators are driven
  * directly (no scalatest bridge in the offline cache) with fixed seeds,
  * so failures are reproducible; each law is checked over several
  * independently drawn datasets.
  */
class PropertyInvariantsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator exhausted"))

  private val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
  private val doc = Gen.chooseNum(1, 9)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpus = Gen.chooseNum(10, 40)
    .flatMap(n => Gen.listOfN(n, doc))

  test("chunkDedupStats conservation: kept+removed==chunks, global kept==distinct hashes") {
    for (seed <- 1L to 5L) {
      val docs = sample(corpus, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val stats = Dedup.chunkDedupStats(docs, "doc_id", "text", chunkTokens = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      // per-doc conservation
      assert(stats.forall { case (n, k, r) => k + r == n }, s"seed=$seed")
      // globally, exactly one copy of every distinct chunk is kept
      val chunks = Packing.chunkByTokens(docs, "doc_id", "text", 2, 2)
      val nChunks = chunks.count()
      val nDistinct = chunks.select(md5(col("chunk_text"))).distinct().count()
      assert(stats.map(_._1).sum == nChunks, s"seed=$seed")
      assert(stats.map(_._2).sum == nDistinct, s"seed=$seed")
    }
  }

  test("chunkByTokens partitions the token sequence: concatenation rebuilds the doc") {
    for (seed <- 6L to 10L) {
      val docs = sample(corpus, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rebuilt = Packing.chunkByTokens(docs, "doc_id", "text", 3, 3)
        .groupBy(col("doc_id"))
        .agg(concat_ws(" ", array_sort(collect_list(
          struct(col("chunk_idx"), col("chunk_text"))))
          .getField("chunk_text")).as("r"))
      val diff = rebuilt.join(docs, Seq("doc_id"))
        .where(col("r") =!= col("text")).count()
      assert(diff == 0, s"seed=$seed")
    }
  }

  private def eventsGen(steps: Seq[String]) = {
    val types = steps ++ Seq("noise1", "noise2", "noise3")
    Gen.chooseNum(20, 80).flatMap(n =>
      Gen.listOfN(n, for {
        u <- Gen.chooseNum(1, 6)
        t <- Gen.oneOf(types)
      } yield (u.toLong, t)))
  }

  test("funnel: stage counts are monotonically non-increasing; one-pass == join form") {
    val steps = Seq("view", "click", "purchase")
    for (seed <- 11L to 15L) {
      // index-derived timestamps → tie-free by construction
      val evs = sample(eventsGen(steps), seed).zipWithIndex.map { case ((u, t), i) =>
        (u, t, new Timestamp(i * 60000L))
      }.toDF("user_id", "event_type", "ts")
      def stages(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getLong(2)).sortBy(_._1).map(_._2).toSeq
      val joinForm = stages(EventAnalytics.funnel(
        evs, "user_id", "event_type", "ts", steps, 72))
      val onePass = stages(EventAnalytics.funnelOnePass(
        evs, "user_id", "event_type", "ts", steps, 72))
      assert(onePass == joinForm, s"seed=$seed")
      assert(joinForm.zip(joinForm.tail).forall { case (a, b) => a >= b },
        s"seed=$seed: stages must shrink, got $joinForm")
    }
  }

  test("debounce: verdict is exactly the gap definition; first per key always kept") {
    for (seed <- 16L to 20L) {
      val evs = sample(eventsGen(Seq("click", "view")), seed).zipWithIndex
        .map { case ((u, t), i) =>
          (i.toLong, u, t, new Timestamp(i * 1000L * (1 + (i % 5))))
        }.toDF("event_id", "user_id", "event_type", "ts")
      val windowSeconds = 600L
      val got = EventAnalytics.debounce(
          evs, "user_id", "event_type", "ts", "event_id", windowSeconds)
        .collect().map(r => (r.getLong(3), r.getBoolean(4)))
      assert(got.forall { case (gap, kept) =>
        kept == (gap == -1L || gap >= windowSeconds * 1000000L)
      }, s"seed=$seed")
      // exactly one gap==-1 row (the first) per observed (user, type)
      val nFirst = got.count(_._1 == -1L)
      val nKeys = evs.select("user_id", "event_type").distinct().count()
      assert(nFirst == nKeys, s"seed=$seed")
    }
  }

  test("capPerKey: never more than cap rows per key, and a subset of the input") {
    for (seed <- 21L to 25L) {
      val rows = sample(Gen.listOfN(60, Gen.chooseNum(1, 5)), seed).zipWithIndex
        .map { case (k, i) => (i.toLong, s"k$k", s"sk$i") }
        .toDF("id", "key", "sk")
      val capped = Sampling.capPerKey(rows, "key", "sk", "id", n = 4)
      val byKey = capped.groupBy("key").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byKey.values.forall(_ <= 4), s"seed=$seed")
      val inputIds = rows.select("id").as[Long].collect().toSet
      val outIds = capped.select("id").as[Long].collect().toSet
      assert(outIds.subsetOf(inputIds), s"seed=$seed")
    }
  }

  // filter-free (a retrying `if u != v` guard can exhaust the
  // generator on unlucky seeds): draw u then a positive offset
  private val randomEdges: Gen[List[(Long, Long)]] =
    Gen.chooseNum(5, 30).flatMap { n =>
      Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 11L)
        d <- Gen.chooseNum(1L, 12L - u)
      } yield (u, u + d))
    }.map(_.distinct)

  test("triangleCount equals the O(n^3) brute-force census on random graphs") {
    for (seed <- 31L to 38L) {
      val edges = sample(randomEdges, seed)
      if (edges.nonEmpty) {
        val got = Graph.triangleCount(edges.toDF("u", "v")).as[Long].head()
        val set = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val expect = (for {
          a <- nodes; b <- nodes if b > a; c <- nodes if c > b
          if set((a, b)) && set((b, c)) && set((a, c))
        } yield 1).size.toLong
        assert(got == expect, s"seed=$seed edges=$edges got=$got expect=$expect")
      }
    }
  }

  test("pageRank invariants on random graphs: node set preserved, floor bound, more iters keep the floor") {
    for (seed <- 41L to 45L) {
      val edges = sample(randomEdges, seed)
      if (edges.nonEmpty) {
        val df = edges.toDF("u", "v")
        val pr = Graph.pageRank(df, iters = 3)
          .as[(Long, Long)].collect().toMap
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(pr.keySet == nodes, s"seed=$seed")
        // every node receives at least the teleport floor, and no node
        // can exceed the teleport floor plus 85% of the total mass
        val totalMass = 1000000L * nodes.size
        assert(pr.values.forall(_ >= 150000L), s"seed=$seed")
        assert(pr.values.forall(_ <= 150000L + 85L * totalMass / 100L), s"seed=$seed")
      }
    }
  }

  test("ewmaSmooth is bounded by the running max and exact on constant series") {
    for (seed <- 51L to 55L) {
      val vals = sample(Gen.listOfN(12, Gen.chooseNum(0L, 1000L)), seed)
      val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("key", "seq", "v")
      val out = EventAnalytics.ewmaSmooth(df, Seq(col("key")), Seq(col("seq")),
          col("v"), as = "e")
        .orderBy("seq").select("v", "e").as[(Long, Long)].collect()
      // the weight ladder sums to < 2^16, so the smoothed value never
      // exceeds the max of the window (floor keeps it strictly under)
      var runMax = 0L
      out.foreach { case (v, e) =>
        runMax = math.max(runMax, v)
        assert(e <= runMax, s"seed=$seed v=$v e=$e max=$runMax")
      }
    }
    // seed-independent: constant series converges to c*(2^16−1)/2^16
    // (floor) — checked once, outside the seed loop
    val const = Seq.fill(20)(65536L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("key", "seq", "v")
    val tail = EventAnalytics.ewmaSmooth(const, Seq(col("key")), Seq(col("seq")),
        col("v"), as = "e")
      .orderBy(col("seq").desc).limit(1).select("e").as[Long].head()
    assert(tail == 65535L, s"constant-series tail=$tail")
  }

  test("bm25TopDocs replays the documented milli ladder on random corpora (brute-force reference)") {
    val queryTerms = Seq("a", "b", "c")
    for (seed <- 61L to 66L) {
      val texts = sample(corpus, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Relevance.bm25TopDocs(docs, "doc_id", "text", queryTerms, k = 100)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // plain-Scala replica of the ladder
      val toks = texts.zipWithIndex.map { case (t, i) => i.toLong -> t.split(" ").toSeq }
      val nDocs = toks.size.toLong
      val lTot = toks.map(_._2.size.toLong).sum
      val tf = for {
        (id, ts) <- toks; term <- queryTerms
        n = ts.count(_ == term).toLong if n > 0
      } yield (id, term, n, ts.size.toLong)
      val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val expect = tf.groupBy(_._1).view.mapValues { rows =>
        val s = rows.map { case (_, term, n, len) =>
          val idf = (2L * (nDocs - df(term)) + 1L) * 1000L / (2L * df(term) + 1L)
          val lr = 1000L * len * nDocs / lTot
          2200L * n * idf / (1000L * n + 300L + 9L * lr / 10L)
        }.sum
        (s, rows.size.toLong)
      }.toMap
      assert(got == expect, s"seed=$seed got=$got expect=$expect")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("spanDedupRewrite equals the brute-force owner-policy reference on random corpora") {
    // spanN = 2 over a 6-letter alphabet: cross-doc 2-gram repeats are
    // frequent, so the policy (drop positions covered by a dup span
    // whose min-doc owner is smaller) is exercised heavily
    for (seed <- 71L to 76L) {
      val texts = sample(corpus, seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = texts.toDF("doc_id", "text")
      val spanN = 2
      val spans = for {
        (id, t) <- texts; toks = t.split(" ") if toks.length >= spanN
        s <- 0 to toks.length - spanN
      } yield (id, s, toks.slice(s, s + spanN).mkString(" "))
      val owners = spans.groupBy(_._3).collect {
        case (g, occ) if occ.map(_._1).distinct.size >= 2 => g -> occ.map(_._1).min
      }
      val expect = texts.map { case (id, t) =>
        val toks = t.split(" ")
        val drop = spans.flatMap { case (i, s, g) =>
          if (i == id && owners.get(g).exists(_ < id)) s until s + spanN else Nil
        }.toSet
        val kept = toks.zipWithIndex.collect { case (tk, ix) if !drop(ix) => tk }
        id -> ((toks.length.toLong, kept.length.toLong, md5hex(kept.mkString(" "))))
      }.toMap
      val got = Dedup.spanDedupRewrite(docs, "doc_id", "text", spanN = spanN)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("selfDupRewrite equals the brute-force first-occurrence reference on random corpora") {
    for (seed <- 81L to 86L) {
      val texts = sample(corpus, seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = texts.toDF("doc_id", "text")
      val spanN = 2
      val expect = texts.map { case (id, t) =>
        val toks = t.split(" ")
        val spans = (0 to toks.length - spanN)
          .map(s => s -> toks.slice(s, s + spanN).mkString(" "))
        val first = spans.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
        val repeated = spans.groupBy(_._2).collect {
          case (g, occ) if occ.size > 1 => g
        }.toSet
        val drop = spans.flatMap { case (s, g) =>
          if (repeated(g) && s > first(g)) s until s + spanN else Nil
        }.toSet
        val kept = toks.zipWithIndex.collect { case (tk, ix) if !drop(ix) => tk }
        id -> ((toks.length.toLong, kept.length.toLong, md5hex(kept.mkString(" "))))
      }.toMap
      val got = Dedup.selfDupRewrite(docs, "doc_id", "text", spanN = spanN)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("semDedup keep/dup_of laws hold against the brute-force in-cell reference") {
    // random 4-dim vectors with planted exact duplicates; the reference
    // recomputes quantized cosines with the identical double ops, so
    // the >= tau comparison cannot diverge
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-100, 100))
      .map(_.map(_ / 100.0f).toArray)
    val corpusGen = Gen.chooseNum(8, 20).flatMap(n => Gen.listOfN(n, vecGen))
    for (seed <- 91L to 94L) {
      val base = sample(corpusGen, seed)
        .filter(_.exists(_ != 0.0f)) // zero vectors have no cosine
      val planted = base ++ base.take(3) // exact dups -> cos 1.0
      val data = planted.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val tau = 0.9
      val rows = Similarity.semDedup(data, "vec_id", "embedding",
          minCosine = tau, nLists = 2, maxCellSize = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      val q = planted.map(_.map(x => math.round(x * 1000.0).toDouble))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        def dot(x: Array[Double], y: Array[Double]) =
          x.zip(y).map { case (p, r) => p * r }.sum
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      }
      val cellOf = rows.map(r => r._1 -> r._2).toMap
      rows.foreach { case (id, cell, dupOf, keep) =>
        val smaller = rows.map(_._1).filter(o => o < id && cellOf(o) == cell &&
          cos(q(o.toInt), q(id.toInt)) >= tau)
        val expectDup = if (smaller.isEmpty) None else Some(smaller.min)
        assert(dupOf == expectDup, s"seed=$seed id=$id")
        assert(keep == expectDup.isEmpty, s"seed=$seed id=$id")
      }
    }
  }

  test("decontaminate keep decision equals the brute-force shared-gram reference") {
    for (seed <- 101L to 105L) {
      val texts = sample(corpus, seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (ev, tr) = texts.partition(_._1 % 3 == 0)
      val trainDf = tr.toDF("doc_id", "text")
      val evalDf = ev.toDF("doc_id", "text")
      def grams(t: String) = {
        val toks = t.split(" ")
        if (toks.length < 2) Set.empty[String]
        else (0 to toks.length - 2).map(s => toks.slice(s, s + 2).mkString(" ")).toSet
      }
      val evalGrams = ev.map { case (id, t) => id -> grams(t) }
      val expect = tr.map { case (id, t) =>
        val g = grams(t)
        val hits = evalGrams.map { case (eid, eg) => eid -> (g & eg).size }
          .filter(_._2 >= 2)
        id -> ((hits.size.toLong,
          (if (hits.isEmpty) 0L else hits.map(_._2).max.toLong), hits.isEmpty))
      }.toMap
      val got = Dedup.decontaminate(trainDf, evalDf, "doc_id", "text",
          shingleN = 2, minSharedGrams = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("bpeFertility conservation: source totals sum to the corpus, pieces mass equals the encoder's") {
    // multi-char words so merges actually fire (1-char terms are
    // excluded from BPE training by construction)
    val bpeWord = Gen.oneOf("aa", "ab", "ba", "abc", "ccc", "b", "cab")
    val bpeDoc = Gen.chooseNum(1, 9)
      .flatMap(n => Gen.listOfN(n, bpeWord).map(_.mkString(" ")))
    val srcDoc = for { s <- Gen.oneOf("s1", "s2", "s3"); d <- bpeDoc } yield (s, d)
    val srcCorpus = Gen.chooseNum(8, 20).flatMap(n => Gen.listOfN(n, srcDoc))
    for (seed <- 111L to 113L) {
      val texts = sample(srcCorpus, seed)
      val docs = texts.toDF("source", "text")
      val merges = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      val fert = TextAnalysis.bpeFertility(docs, "text", "source", merges)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val totalWords = texts.map(_._2.split(" ").length.toLong).sum
      assert(fert.map(_._2).sum == totalWords, s"seed=$seed")
      // every word encodes to >= 1 piece and <= its length
      fert.foreach { case (s, w, bpe, f) =>
        assert(bpe >= w && f >= 1.0, s"seed=$seed source=$s")
      }
      // cross-op conservation: Σ cnt·pieces == the encoder's total token mass
      val encMass = TextAnalysis.bpeEncode(docs, "text", merges)
        .agg(sum(col("n_occ"))).collect()(0).getLong(0)
      assert(fert.map(_._3).sum == encMass, s"seed=$seed")
    }
  }

  test("modularity conservation: Σ intra ≤ m, Σ degree_sum == 2m, trivial partition folds to q_num 0") {
    for (seed <- 31L to 34L) {
      val edges = sample(Gen.chooseNum(5, 25).flatMap(n => Gen.listOfN(n,
          Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))), seed)
        .collect { case (u, v) if u != v => (math.min(u, v), math.max(u, v)) }
        .distinct
      if (edges.nonEmpty) {
        val e = edges.toDF("u", "v")
        val lbl = Graph.labelPropagation(e, rounds = 2)
        val rows = Graph.modularity(e, lbl)
          .select(col("intra_edges"), col("degree_sum"), col("q_num"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val m = edges.size.toLong
        assert(rows.map(_._1).sum <= m, s"seed=$seed")
        assert(rows.map(_._2).sum == 2 * m, s"seed=$seed")
        // Σ q_num = 4m·Σintra − Σd_c² and the all-one partition is 0
        val one = e.select(col("u").as("node"))
          .unionByName(e.select(col("v").as("node"))).distinct()
          .select(col("node"), lit(1L).as("community"))
        val t = Graph.modularity(e, one).select(col("q_num"))
          .collect().map(_.getLong(0))
        assert(t.toSeq == Seq(0L), s"seed=$seed")
      }
    }
  }

  test("betweennessSampled invariants: deltas non-negative; a clique has zero brokerage everywhere") {
    for (seed <- 35L to 37L) {
      val edges = sample(Gen.chooseNum(5, 20).flatMap(n => Gen.listOfN(n,
          Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L)))), seed)
        .collect { case (u, v) if u != v => (math.min(u, v), math.max(u, v)) }
        .distinct
      if (edges.nonEmpty) {
        val e = edges.toDF("u", "v")
        val src = e.select(col("u").as("node")).orderBy(col("node")).limit(2)
        val bc = Graph.betweennessSampled(e, src, radius = 2)
          .select(col("bc_micro")).collect().map(_.getLong(0))
        assert(bc.forall(_ >= 0L), s"seed=$seed")
      }
    }
    // complete graph on 5 nodes: every pair adjacent -> no 2-hop
    // shortest path needs a middleman -> every delta is exactly 0
    val k5 = (for { u <- 1L to 5L; v <- (u + 1) to 5L } yield (u, v))
      .toDF("u", "v")
    val bcK5 = Graph.betweennessSampled(k5,
        Seq(1L, 2L).toDF("node"), radius = 2)
      .select(col("bc_micro")).collect().map(_.getLong(0))
    assert(bcK5.forall(_ == 0L), s"got ${bcK5.mkString(",")}")
  }

  test("noveltyScore bounds and identity: self-reference scores 0; disjoint reference scores 10^6") {
    for (seed <- 38L to 41L) {
      val docs = sample(corpus, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // candidates scored against THEMSELVES: every gram is known
      val self = Dedup.noveltyScore(docs, docs, "doc_id", "text", shingleN = 2)
        .select(col("novelty_ppm")).collect().map(_.getLong(0))
      assert(self.forall(_ == 0L), s"seed=$seed")
      // against a reference guaranteed disjoint (words outside the
      // generator's alphabet): everything is new
      val ref = Seq((999L, "zz yy zz yy")).toDF("doc_id", "text")
      val nov = Dedup.noveltyScore(docs, ref, "doc_id", "text", shingleN = 2)
        .select(col("novelty_ppm")).collect().map(_.getLong(0))
      assert(nov.forall(_ == 1000000L), s"seed=$seed")
    }
  }
}
