package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_micros, unix_micros}

/** transformWithState ops: each asserted bit-equal to its batch and/or
  * mapGroupsWithState twin on the same rows, plus checkpoint-restart
  * recovery (the state genuinely lives in the RocksDB store — TWS
  * requires that provider, so every test here pins it and flips the
  * session back after). */
class TwsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def withRocks[A](body: => A): A = {
    StreamOps.withRocksDBStateStore(spark)
    try body finally StreamOps.withDefaultStateStore(spark)
  }

  test("firstSeenStream emits exactly the batch-distinct (group, item) set, once each") {
    withRocks {
      // within-batch repeats AND cross-batch repeats, plus a null item
      val b1 = Seq(StreamOps.KeyedItem("g1", "a"), StreamOps.KeyedItem("g1", "a"),
        StreamOps.KeyedItem("g1", "b"), StreamOps.KeyedItem("g2", "a"),
        StreamOps.KeyedItem("g1", null))
      val b2 = Seq(StreamOps.KeyedItem("g1", "a"), StreamOps.KeyedItem("g1", "c"),
        StreamOps.KeyedItem("g2", "a"), StreamOps.KeyedItem("g2", "b"))
      val mem = MemoryStream[StreamOps.KeyedItem](spark, 1)
      val out = TwsOps.firstSeenStream(spark, mem.toDS())
      val ckpt = tmpDir("tws-seen-ckpt")
      val outDir = tmpDir("tws-seen-out")
      def start() = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      mem.addData(b1: _*)
      q1.processAllAvailable()
      q1.stop()
      // restart across a checkpoint: the seen-map must carry over, so
      // b2's repeats of (g1,a)/(g2,a) stay suppressed
      mem.addData(b2: _*)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val got = spark.read.parquet(outDir).as[TwsOps.FirstSeen].collect()
        .map(f => (f.group, f.item)).sorted.toSeq
      val batch = (b1 ++ b2).filter(_.item != null)
        .map(k => (k.group, k.item)).distinct.sorted
      assert(got == batch)
      assert(got.size == got.distinct.size) // once each, never twice
    }
  }

  test("firstSeenStreamWithCorpus: corpus items suppress, never emit — the streamed d39") {
    withRocks {
      val corpus = Seq(StreamOps.KeyedItem("g1", "a"), StreamOps.KeyedItem("g1", "b"),
        StreamOps.KeyedItem("g2", "a"), StreamOps.KeyedItem("g2", null)).toDS()
      val b1 = Seq(StreamOps.KeyedItem("g1", "a"), StreamOps.KeyedItem("g1", "c"))
      val b2 = Seq(StreamOps.KeyedItem("g1", "b"), StreamOps.KeyedItem("g1", "c"),
        StreamOps.KeyedItem("g2", "a"), StreamOps.KeyedItem("g2", "d"),
        StreamOps.KeyedItem("g3", "a"))
      val mem = MemoryStream[StreamOps.KeyedItem](spark, 1)
      val out = TwsOps.firstSeenStreamWithCorpus(spark, mem.toDS(), corpus)
      val ckpt = tmpDir("tws-corp-ckpt")
      val outDir = tmpDir("tws-corp-out")
      def start() = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      mem.addData(b1: _*)
      q1.processAllAvailable()
      q1.stop()
      // restart: both the corpus bootstrap AND batch-1 arrivals must
      // stay suppressed (b, a are corpus; c arrived in batch 1)
      mem.addData(b2: _*)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val got = spark.read.parquet(outDir).as[TwsOps.FirstSeen].collect()
        .map(f => (f.group, f.item)).sorted.toSeq
      // novel vs corpus ∪ stream-so-far: g1/c (batch 1), g2/d, g3/a —
      // g3 has NO initial state, its first arrival emits
      assert(got == Seq(("g1", "c"), ("g2", "d"), ("g3", "a")))
    }
  }

  test("runningTotalsTws final per-key totals match the mGWS twin and the batch aggregate") {
    withRocks {
      val rows = Seq(
        StreamOps.KeyedEvent(1L, 1.5), StreamOps.KeyedEvent(1L, 2.5),
        StreamOps.KeyedEvent(2L, 10.0), StreamOps.KeyedEvent(1L, 4.0),
        StreamOps.KeyedEvent(3L, -1.0))
      val mem = MemoryStream[StreamOps.KeyedEvent](spark, 1)
      val out = TwsOps.runningTotalsTws(spark, mem.toDS(), idleTtl = None)
      mem.addData(rows: _*)
      val got = StreamOps.runToMemory(spark, out.toDF(), "tws_totals_t", "update")
        .as[StreamOps.RunningTotal].collect()
        .groupBy(_.user_id).map { case (k, rs) => rs.maxBy(_.n) } // last update per key
        .map(r => (r.user_id, r.n, r.total)).toSet
      val batch = rows.groupBy(_.user_id).map { case (k, es) =>
        (k, es.size.toLong, es.map(_.value).sum)
      }.toSet
      assert(got == batch)

      // and the mGWS twin on the same rows agrees (update-for-update:
      // both emit one row per touched key per batch; one batch here)
      val mem2 = MemoryStream[StreamOps.KeyedEvent](spark, 1)
      val twin = StreamOps.runningTotals(spark, mem2.toDS(), idleTimeout = None)
      mem2.addData(rows: _*)
      val twinRows = StreamOps.runToMemory(spark, twin.toDF(), "mgws_totals_t")
        .as[StreamOps.RunningTotal].collect()
        .map(r => (r.user_id, r.n, r.total)).toSet
      assert(twinRows == got)
    }
  }

  test("runningTotalsTws accumulates across batches and survives a restart") {
    withRocks {
      val mem = MemoryStream[StreamOps.KeyedEvent](spark, 1)
      val out = TwsOps.runningTotalsTws(spark, mem.toDS(), idleTtl = None)
      val ckpt = tmpDir("tws-tot-ckpt")
      val outDir = tmpDir("tws-tot-out")
      def start() = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      mem.addData(StreamOps.KeyedEvent(7L, 1.0), StreamOps.KeyedEvent(7L, 2.0))
      q1.processAllAvailable()
      q1.stop()
      mem.addData(StreamOps.KeyedEvent(7L, 4.0))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val last = spark.read.parquet(outDir).as[StreamOps.RunningTotal]
        .collect().maxBy(_.n)
      assert(last == StreamOps.RunningTotal(7L, 3L, 7.0))
    }
  }

  test("TTL-enabled forms run and stay correct (TTL requires ProcessingTime mode — regression)") {
    // Spark 4.1 throws STATEFUL_PROCESSOR_CANNOT_ASSIGN_TTL_IN_TIME_MODE
    // at query start if a non-zero TTL is paired with TimeMode.None —
    // the ops must derive the mode from the TTL argument. The generous
    // TTLs here cannot expire inside the test, so values are unchanged.
    // ProcessingTime mode triggers batches CONTINUOUSLY (each runs the
    // TTL sweep), which livelocks processAllAvailable (noNewData resets
    // every trigger) and keeps AvailableNow from terminating — so these
    // tests poll the sink to a deadline instead of either blocking call
    def awaitRows(table: String, atLeast: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table(table).count() < atLeast) {
        assert(System.nanoTime() < deadline, s"$table never reached $atLeast rows")
        Thread.sleep(100)
      }
    }
    withRocks {
      val mem = MemoryStream[StreamOps.KeyedEvent](spark, 1)
      // DEFAULT idleTtl = Some(1 hour) — the advertised default must start
      val out = TwsOps.runningTotalsTws(spark, mem.toDS())
      val q = out.writeStream.format("memory").queryName("tws_ttl_t")
        .outputMode("update").start()
      mem.addData(StreamOps.KeyedEvent(1L, 2.0), StreamOps.KeyedEvent(1L, 3.0))
      try awaitRows("tws_ttl_t", 1) finally q.stop()
      val got = spark.table("tws_ttl_t")
        .as[StreamOps.RunningTotal].collect().maxBy(_.n)
      assert(got == StreamOps.RunningTotal(1L, 2L, 5.0))

      val mem2 = MemoryStream[StreamOps.KeyedItem](spark, 1)
      val seen = TwsOps.firstSeenStream(spark, mem2.toDS(),
        ttl = Some(java.time.Duration.ofHours(24)))
      val q2 = seen.writeStream.format("memory").queryName("tws_ttl_seen_t")
        .outputMode("append").start()
      mem2.addData(StreamOps.KeyedItem("g", "a"), StreamOps.KeyedItem("g", "a"),
        StreamOps.KeyedItem("g", "b"))
      try awaitRows("tws_ttl_seen_t", 2) finally q2.stop()
      val emitted = spark.table("tws_ttl_seen_t")
        .as[TwsOps.FirstSeen].collect().map(_.item).sorted.toSeq
      assert(emitted == Seq("a", "b"))
    }
  }

  test("sessionizeTws: timer emission matches batch boundaries, bridges across a restart") {
    withRocks {
      def ev(id: Long, user: Long, sec: Long) =
        StreamOps.TypedEvent(id, user, "e", sec * 1000000L)
      // gap 10 s; watermark 1 h so nothing below is late. Times are
      // 1000-origin: an event at exactly epoch 0 TIES the engine's
      // initial watermark and the engine's eventTime <= watermark
      // filter silently drops it (the StreamSoak 1-origin rule).
      // user 1: t=1000 and t=1018 (two open sessions), then t=1009
      // BRIDGES them; user 2: singleton; user 3: out-of-order in batch.
      val b1 = Seq(ev(1, 1, 1000), ev(2, 1, 1018), ev(4, 2, 1005))
      val b2 = Seq(ev(3, 1, 1009), ev(6, 3, 1105), ev(5, 3, 1100))
      val sentinel = Seq(ev(99, 99, 10000))
      val mem = MemoryStream[StreamOps.TypedEvent](spark, 1)
      val out = TwsOps.sessionizeTws(spark, mem.toDS(), gapSeconds = 10,
        watermark = "1 hour")
      val ckpt = tmpDir("tws-sess-ckpt")
      val outDir = tmpDir("tws-sess-out")
      def start() = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      mem.addData(b1: _*)
      q1.processAllAvailable()
      q1.stop()
      // restart across a checkpoint: open sessions AND their timers must
      // recover for the bridge-merge and the final emission to work
      mem.addData(b2: _*)
      val q2 = start()
      q2.processAllAvailable()
      mem.addData(sentinel: _*)
      q2.processAllAvailable()
      q2.stop()
      val got = spark.read.parquet(outDir).as[TwsOps.SessionEmit].collect()
        .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
        .sortBy(t => (t._1, t._2)).toSeq
      val expected = Seq(
        (1L, 1000000000L, 1028000000L, 3L), // bridged: 1000,1009,1018 → end 1018+10
        (2L, 1005000000L, 1015000000L, 1L),
        (3L, 1100000000L, 1115000000L, 2L)) // sentinel's own session stays open
      assert(got == expected)

      // and the batch formulation agrees on the same rows (user 99
      // excluded — its session is still open on the stream side)
      val batch = graft.ops.EventAnalytics.sessionize(
          (b1 ++ b2).toDS().toDF()
            .select(col("user_id"), col("event_id"),
              timestamp_micros(col("ts_us")).as("ts")),
          "user_id", "ts", "event_id", gapSeconds = 10)
        .select(col("user_id"), unix_micros(col("session_start")),
          unix_micros(col("session_end")), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
      assert(batch == expected)
    }
  }

  test("sessionizeTws: rows older than the watermark are dropped (pinned late-row rule)") {
    withRocks {
      def ev(id: Long, user: Long, sec: Long) =
        StreamOps.TypedEvent(id, user, "e", sec * 1000000L)
      val mem = MemoryStream[StreamOps.TypedEvent](spark, 1)
      val out = TwsOps.sessionizeTws(spark, mem.toDS(), gapSeconds = 10,
        watermark = "5 seconds")
      val ckpt = tmpDir("tws-late-ckpt")
      val outDir = tmpDir("tws-late-out")
      val q = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      mem.addData(ev(1, 1, 100), ev(9, 9, 200)) // wm after batch: 195 s
      q.processAllAvailable()
      mem.addData(ev(2, 1, 50), ev(3, 1, 300)) // t=50 < wm → dropped
      q.processAllAvailable()
      mem.addData(ev(99, 9, 1000)) // drive wm past 310
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(outDir).as[TwsOps.SessionEmit].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start_us, s.session_end_us, s.n_events))
        .sortBy(_._1).toSeq
      // the 50 s event appears NOWHERE (batch would give it a session —
      // the documented stream-side divergence); 100 s and 300 s emit
      assert(got == Seq((100000000L, 110000000L, 1L), (300000000L, 310000000L, 1L)))
    }
  }

  test("firstSeenStream on the default HDFS-backed provider fails at start (documented contract)") {
    // the scaladoc's backend contract: TWS requires RocksDB — assert the
    // failure mode is a query error, not silent wrong answers
    val mem = MemoryStream[StreamOps.KeyedItem](spark, 1)
    val out = TwsOps.firstSeenStream(spark, mem.toDS())
    mem.addData(StreamOps.KeyedItem("g", "x"))
    val ex = intercept[Exception] {
      StreamOps.runToMemory(spark, out.toDF(), "tws_wrong_backend_t")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
    // Spark 4.1 phrases it as the column-family capability the HDFS
    // provider lacks (STATE_STORE_MULTIPLE_COLUMN_FAMILIES)
    assert(chain(ex).exists(m =>
      m.contains("HDFSBackedStateStoreProvider") ||
        m.toLowerCase.contains("rocksdb")),
      s"unexpected failure chain: ${chain(ex).mkString(" <- ")}")
  }

  test("noveltyStream: tally bit-equals noveltyScore against each prefix, incl. across restart") {
    withRocks {
      val refDocs = Seq(
        (10L, "the quick brown fox jumps over the lazy dog tonight"),
        (11L, "spark engines process large corpora with shuffles and joins"))
        .toDF("doc_id", "text")
      // b1: one doc mostly known (near-copy of ref 10), one fully new
      val b1 = Seq(
        TwsOps.StreamDoc(1L, "the quick brown fox jumps over the lazy dog today"),
        TwsOps.StreamDoc(2L, "completely novel sentence about training data curation"))
      // b2: repeats b1's novel text (novelty must now be 0 vs corpus ∪ b1)
      // and adds a short doc (< 3 tokens -> no grams -> dropped, the d72 rule)
      val b2 = Seq(
        TwsOps.StreamDoc(3L, "completely novel sentence about training data curation"),
        TwsOps.StreamDoc(4L, "too short"))
      val corpusGrams = TwsOps.referenceGrams(refDocs, "doc_id", "text").as[String]
      val mem = MemoryStream[TwsOps.StreamDoc](spark, 1)
      val out = TwsOps.noveltyStream(spark, mem.toDS(), corpusGrams)
      val ckpt = tmpDir("tws-nov-ckpt")
      val outDir = tmpDir("tws-nov-out")
      def start() = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      mem.addData(b1: _*)
      q1.processAllAvailable()
      q1.stop()
      // restart between prefixes: corpus bootstrap AND b1's gram marks
      // must survive through the changelog
      mem.addData(b2: _*)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val flags = spark.read.parquet(outDir)
      val got = TwsOps.noveltyTally(flags)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // batch replay: b1 docs score vs ref; b2 docs score vs ref ∪ b1
      def score(docs: Seq[(Long, String)], ref: org.apache.spark.sql.DataFrame) =
        graft.ops.Dedup.noveltyScore(docs.toDF("doc_id", "text"), ref,
            "doc_id", "text")
          .as[(Long, Long, Long, Long)].collect().toSeq
      val want = (score(b1.map(d => d.doc_id -> d.text), refDocs) ++
        score(b2.map(d => d.doc_id -> d.text),
          refDocs.unionByName(b1.map(d => d.doc_id -> d.text).toDF("doc_id", "text"))))
        .sortBy(_._1)
      assert(got == want, s"got $got want $want")
      // doc 3 is a verbatim repeat of doc 2: zero novelty vs corpus ∪ b1
      assert(got.find(_._1 == 3L).get._4 == 0L)
      // doc 4 carried no grams: dropped on both sides
      assert(!got.exists(_._1 == 4L))
    }
  }

  test("noveltyStream with updateWithArrivals=false scores every batch against the fixed corpus") {
    withRocks {
      val refDocs = Seq((10L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")
      val doc = TwsOps.StreamDoc(1L, "alpha beta gamma delta brand new ending")
      val corpusGrams = TwsOps.referenceGrams(refDocs, "doc_id", "text").as[String]
      val mem = MemoryStream[TwsOps.StreamDoc](spark, 1)
      val out = TwsOps.noveltyStream(spark, mem.toDS(), corpusGrams,
        updateWithArrivals = false)
      val ckpt = tmpDir("tws-novf-ckpt")
      val outDir = tmpDir("tws-novf-out")
      val q = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      mem.addData(doc)
      q.processAllAvailable()
      // second batch, same doc text under a new id: same score — the
      // fixed-corpus mode never learns from arrivals
      mem.addData(TwsOps.StreamDoc(2L, doc.text))
      q.processAllAvailable()
      q.stop()
      val got = TwsOps.noveltyTally(spark.read.parquet(outDir))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got.size == 2 && got(0)._4 == got(1)._4 && got(0)._4 > 0L,
        s"got $got")
    }
  }
}
