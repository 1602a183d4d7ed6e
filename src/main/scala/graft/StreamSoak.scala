package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps

/** Streaming STATE soak: the ByDay monitors' bit-equality laws are
  * spec-proven on small fixtures, but the 100 TB streaming story rests
  * on two claims the specs cannot see — that state is bounded by
  * groups × days-inside-the-lateness-horizon (NOT by history), and
  * that watermark eviction actually removes sealed days from the
  * store. This main drives the RocksDB-backed forms over a large key
  * universe and a multi-day event-time horizon and READS THE STATE
  * STORE METRICS per batch (`lastProgress.stateOperators`:
  * numRowsTotal, numRowsRemoved, stateMemory), then asserts:
  *
  *   1. PLATEAU: once the watermark starts sealing days, state rows
  *      stop growing with history — rows at day D ≈ rows at day
  *      horizon+1, for every later D (growth bound 1.15×: RocksDB
  *      numRowsTotal is exact row count, the slack only absorbs
  *      batch-boundary timing of the timeout sweep);
  *   2. EVICTION: cumulative numRowsRemoved ≥ keys × sealed days —
  *      every sealed (group, day) was physically removed, not merely
  *      stopped-being-emitted;
  *   3. BOUND: peak numRowsTotal ≤ keys × (1 + horizon days + 1 slack
  *      day for the batch straddling the seal).
  *
  * Ops soaked: zscoreStreamByDay (3 longs per open (group, day) — the
  * smallest per-key state) and hllDistinctStreamByDay (2^p register
  * bytes per open (group, day) — the constant-sketch-bytes contract).
  * One batch per event-time day, every group active every day, so
  * without eviction state would reach keys × days and the plateau
  * assertion fails loudly.
  *
  * Usage: runMain graft.StreamSoak [keys] [days] [lateness-days]
  * (defaults 200000 keys × 8 days × 1-day lateness ≈ 1.6 M state
  * creations per op; prints one JSON line with the per-day state-row
  * ladder and peak/final RocksDB memory.)
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val keys = if (args.length > 0) args(0).toInt else 200000
    val days = if (args.length > 1) args(1).toInt else 8
    val horizonDays = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // streaming: AQE is inert, keep plans stable
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StreamOps.withRocksDBStateStore(spark)
    import spark.implicits._

    final case class OpReport(name: String, rowsByDay: Seq[Long],
        removedTotal: Long, peakRows: Long, finalRows: Long,
        peakMemBytes: Long, wallSec: Double)

    /** Drive one op day-by-day; return the state ladder + metrics. */
    def soak(name: String)(
        mkQuery: (MemoryStream[StreamOps.TimedValue]) => org.apache.spark.sql.streaming.DataStreamWriter[_]): OpReport = {
      val mem = MemoryStream[StreamOps.TimedValue](spark, 1)
      val q = mkQuery(mem).start()
      val t0 = System.nanoTime()
      val ladder = (0 until days).map { d =>
        // one event per key per day, ts inside epoch day d+1 — plus one
        // max-ts row that drags the watermark to the day's end so the
        // day horizon+1 back seals during this batch. Days are 1-ORIGIN
        // deliberately: an event at exactly epoch 0 TIES the engine's
        // initial watermark and the stateful late-row filter drops
        // eventTime <= watermark — at 200 k keys the generator's
        // (k % 86400) offset puts g86400/g172800's only day-0 event at
        // ts 0, silently shaving 2 states off the day-0 ladder (found
        // by this soak's own eviction assertion). Real pipelines never
        // carry epoch-0 event times; the shift keeps the expectation
        // exact instead of special-casing the degenerate boundary.
        val dayMs = (d + 1).toLong * 86400000L
        val batch = (0 until keys).map { k =>
          StreamOps.TimedValue(s"g$k",
            new java.sql.Timestamp(dayMs + (k % 86400) * 1000L),
            java.lang.Long.valueOf((k % 97).toLong))
        } :+ StreamOps.TimedValue("g0",
          new java.sql.Timestamp(dayMs + 86399999L),
          java.lang.Long.valueOf(1L))
        mem.addData(batch: _*)
        q.processAllAvailable()
        // an empty follow-up batch lets the event-time timeout sweep run
        // against the watermark the previous batch advanced
        mem.addData(StreamOps.TimedValue("g0",
          new java.sql.Timestamp(dayMs + 86399999L), java.lang.Long.valueOf(1L)))
        q.processAllAvailable()
        val so = q.lastProgress.stateOperators
        (so.map(_.numRowsTotal).sum, so.map(_.numRowsRemoved).sum,
          so.map(_.memoryUsedBytes).sum)
      }
      q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val removed = {
        // numRowsRemoved is per-batch; re-walk recentProgress for the sum
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      }
      OpReport(name, ladder.map(_._1), removed,
        ladder.map(_._1).max, ladder.last._1, ladder.map(_._3).max, wall)
    }

    val zscore = soak("zscore_by_day") { mem =>
      StreamOps.zscoreStreamByDay(spark, mem.toDS(), s"$horizonDays day")
        .writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("soak-z").toString)
        .outputMode("append")
    }

    val hll = {
      val mem = MemoryStream[StreamOps.TimedItem](spark, 1)
      val q = StreamOps.hllDistinctStreamByDay(spark, mem.toDS(), s"$horizonDays day", p = 9)
        .writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("soak-h").toString)
        .outputMode("append").start()
      val t0 = System.nanoTime()
      val ladder = (0 until days).map { d =>
        // 1-origin days for the same epoch-0-ties-the-watermark reason
        // as the zscore generator above
        val dayMs = (d + 1).toLong * 86400000L
        val batch = (0 until keys).map { k =>
          StreamOps.TimedItem(s"g$k",
            new java.sql.Timestamp(dayMs + (k % 86400) * 1000L), s"item${k % 31}")
        } :+ StreamOps.TimedItem("g0",
          new java.sql.Timestamp(dayMs + 86399999L), "item0")
        mem.addData(batch: _*)
        q.processAllAvailable()
        mem.addData(StreamOps.TimedItem("g0",
          new java.sql.Timestamp(dayMs + 86399999L), "item0"))
        q.processAllAvailable()
        val so = q.lastProgress.stateOperators
        (so.map(_.numRowsTotal).sum, so.map(_.numRowsRemoved).sum,
          so.map(_.memoryUsedBytes).sum)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val removed = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      q.stop()
      OpReport("hll_by_day", ladder.map(_._1), removed,
        ladder.map(_._1).max, ladder.last._1, ladder.map(_._3).max, wall)
    }

    // ---- assertions: plateau, eviction, bound ----
    val reports = Seq(zscore, hll)
    val settleDay = horizonDays + 1 // first day whose batch seals a prior day
    var failed = false
    reports.foreach { r =>
      val settled = r.rowsByDay(settleDay)
      val plateauOk = r.rowsByDay.drop(settleDay).forall(_ <= (settled * 1.15).toLong + 1)
      val sealedDays = (days - 1 - horizonDays).max(0)
      val evictOk = r.removedTotal >= keys.toLong * sealedDays
      val boundOk = r.peakRows <= keys.toLong * (horizonDays + 2)
      if (!(plateauOk && evictOk && boundOk)) failed = true
      System.err.println(s"[soak] ${r.name}: rowsByDay=${r.rowsByDay.mkString(",")} " +
        s"removed=${r.removedTotal} peak=${r.peakRows} final=${r.finalRows} " +
        s"peakMemMB=${r.peakMemBytes / 1024 / 1024} wall=${f"${r.wallSec}%.1f"}s " +
        s"plateau=$plateauOk evict=$evictOk bound=$boundOk")
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val line = reports.map { r =>
      s""""${r.name}":{"rows_by_day":[${r.rowsByDay.mkString(",")}],""" +
        s""""removed":${r.removedTotal},"peak_rows":${r.peakRows},""" +
        s""""final_rows":${r.finalRows},"peak_mem_mb":${r.peakMemBytes / 1024 / 1024},""" +
        s""""wall_sec":${num(r.wallSec)}}"""
    }.mkString(s"""{"metric":"stream_soak","keys":$keys,"days":$days,""" +
      s""""horizon_days":$horizonDays,"ok":${!failed},"ops":{""", ",", "}}")
    spark.stop()
    println(line)
    if (failed) sys.exit(1)
  }
}
