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
}
