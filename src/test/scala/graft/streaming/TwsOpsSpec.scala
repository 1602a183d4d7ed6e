package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

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
}
