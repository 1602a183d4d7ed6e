package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression fixture for the events.parquet `ts` layout drift that broke
  * q53_funnel / q57_event_debounce in round 8: the driver regenerated the
  * testdata with `ts` as parquet micros-no-tz (Spark TIMESTAMP_NTZ) where
  * it had been TIMESTAMP(NANOS), and the loader's pass-through branch fed
  * NTZ into `unix_micros`, which rejects it at analysis time.
  *
  * The contract under test: [[Tables.events]] normalizes EVERY layout the
  * testdata has ever shipped — INT64 nanos, micros-NTZ, tz-adjusted
  * micros — to the session-zoned TIMESTAMP type with identical values
  * (session TZ pinned UTC), and the two `unix_micros`-dependent operators
  * (funnelOnePass, debounce) run and agree bit-for-bit across layouts.
  */
class TablesLayoutSpec extends SparkSpec {

  /** One tiny funnel-shaped log: two users, view→click→purchase inside
    * the horizon for u1, view-only for u2, plus a rapid-fire repeat for
    * the debounce verdict. Micros chosen so nanos = us*1000 is exact. */
  private val baseUs: Long = 1700000000000000L // 2023-11-14T22:13:20Z
  private val rows = Seq(
    // (event_id, us, user_id, event_type)
    (1L, baseUs, 10L, "view"),
    (2L, baseUs + 3600L * 1000000L, 10L, "click"),
    (3L, baseUs + 7200L * 1000000L, 10L, "purchase"),
    (4L, baseUs + 1000L, 10L, "view"),      // 1 ms after e1 → debounced
    (5L, baseUs + 500L, 20L, "view")
  )

  /** Write the log at `dir/events.parquet` in the given layout and
    * return the loader's view of it. */
  private def writeAndLoad(layout: String): DataFrame = {
    import spark.implicits._
    val dir = tmpDir(s"events-$layout")
    val us = rows.toDF("event_id", "us", "user_id", "event_type")
    val df = layout match {
      case "nanos-long" => // legacy TIMESTAMP(NANOS), read as raw long
        us.withColumn("ts", col("us") * 1000L)
      case "micros-ntz" => // the round-8 driver layout
        us.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      case "micros-tz" => // ScaleCorpus / instant layout
        us.withColumn("ts", timestamp_micros(col("us")))
    }
    df.drop("us").write.parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  private val layouts = Seq("nanos-long", "micros-ntz", "micros-tz")

  test("events loader normalizes every ts layout to TIMESTAMP with identical values") {
    val loaded = layouts.map(l => l -> writeAndLoad(l)).toMap
    for ((l, df) <- loaded) {
      assert(df.schema("ts").dataType == TimestampType, s"layout $l")
    }
    val values = loaded.view.mapValues(
      _.select(col("event_id"), Tables.tsMicros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    ).toMap
    val expected = rows.sortBy(_._1).map(r => (r._1, r._2))
    for (l <- layouts) assert(values(l) == expected, s"layout $l")
  }

  test("funnelOnePass and debounce run identically over all three layouts") {
    val results = layouts.map { l =>
      val ev = writeAndLoad(l)
      val funnel = ops.EventAnalytics
        .funnelOnePass(ev, "user_id", "event_type", "ts",
          steps = Seq("view", "click", "purchase"), horizonHours = 72)
        .orderBy("stage").collect().map(_.toSeq).toSeq
      val deb = ops.EventAnalytics
        .debounce(ev, "user_id", "event_type", "ts", "event_id",
          windowSeconds = 86400L)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      (l, funnel, deb)
    }
    val (_, funnel0, deb0) = results.head
    // semantic spot-check: u1 completes the funnel, u2 stops at view
    assert(funnel0.map(r => (r(1), r(2))) ==
      Seq(("view", 2L), ("click", 1L), ("purchase", 1L)))
    // e4 arrives 1 ms after e1 (same user+type) → not kept; all others kept
    assert(deb0.map(r => (r.head, r.last)) ==
      Seq((1L, true), (2L, true), (3L, true), (4L, false), (5L, true)))
    for ((l, f, d) <- results.tail) {
      assert(f == funnel0, s"funnel mismatch for layout $l")
      assert(d == deb0, s"debounce mismatch for layout $l")
    }
  }
}
