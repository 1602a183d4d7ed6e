package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing must remove the shuffle from a key-aligned join — the plan
  * assertion IS the test (result equality alone wouldn't prove the
  * scale property). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without an Exchange; result matches plain join") {
    val left = (1L to 200L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 200L).filter(_ % 2 == 0).map(k => (k, s"r$k")).toDF("k", "rv")

    Bucketing.writeBucketed(left, "bkt_left", "k", buckets = 4, sortBy = Seq("k"))
    Bucketing.writeBucketed(right, "bkt_right", "k", buckets = 4, sortBy = Seq("k"))
    // small tables would broadcast (also shuffle-free, but trivially so);
    // force the shuffle-join path so the bucketing claim is actually tested
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      assert(!Bucketing.hasShuffle(bucketed), bucketed.queryExecution.executedPlan.toString)

      val plain = left.join(right, "k")
      assert(Bucketing.hasShuffle(plain)) // unbucketed baseline must shuffle
      assert(bucketed.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
        plain.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("groupBy on the bucket key also avoids the shuffle") {
    val df = (1L to 100L).map(k => (k % 10, k)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bkt_agg", "k", buckets = 4)
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      assert(!Bucketing.hasShuffle(agg), agg.queryExecution.executedPlan.toString)
      val expected = df.groupBy("k").agg(sum("v").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }

  test("external-path bucketed write: q112's join shape plans shuffle-free and the files land at the path") {
    val tmp = java.nio.file.Files.createTempDirectory("bktq112").toString
    val fact = (1L to 300L).map(k => (k % 50, k)).toDF("k", "cents")
    val dim = (0L until 50L).map(k => (k, s"p${k % 5}")).toDF("k", "prio")
    Bucketing.writeBucketed(fact, "bkt_q112_f", "k", buckets = 4,
      sortBy = Seq("k"), path = Some(s"$tmp/f"))
    Bucketing.writeBucketed(dim, "bkt_q112_d", "k", buckets = 4,
      sortBy = Seq("k"), path = Some(s"$tmp/d"))
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(new java.io.File(s"$tmp/f").listFiles().exists(_.getName.endsWith(".parquet")))
      val joined = Bucketing.bucketedJoin(spark, "bkt_q112_f", "bkt_q112_d", "k")
      assert(!Bucketing.hasShuffle(joined), joined.queryExecution.executedPlan.toString)
      val agg = joined.groupBy("prio")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      val want = fact.join(dim, "k").groupBy("prio")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(agg == want)
      // re-write with a different path must not be satisfied by the stale table
      Bucketing.writeBucketed(fact.limit(10), "bkt_q112_f", "k", buckets = 4,
        sortBy = Seq("k"), path = Some(s"$tmp/f2"))
      assert(spark.table("bkt_q112_f").count() == 10L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS bkt_q112_f")
      spark.sql("DROP TABLE IF EXISTS bkt_q112_d")
    }
  }

  test("zOrderKey interleaves bits: x on even positions, y on odd") {
    val df = Seq((3L, 5L), (255L, 0L), (0L, 255L), (256L, 256L)).toDF("x", "y")
    val got = df.select(Bucketing.zOrderKey(col("x"), col("y"), 8))
      .collect().map(_.getLong(0)).toSeq
    // x=3 (011), y=5 (101): evens 1+4, odds 2+32 → 39
    assert(got(0) == 39L)
    assert(got(1) == 0x5555L) // all-x pattern
    assert(got(2) == 0xAAAAL) // all-y pattern
    assert(got(3) == 0L)      // only the low 8 bits participate
  }

  test("zOrderKey clusters both dimensions: bucket ranges are narrow in x AND y") {
    // On a 16×16 grid cut into 4 z-buckets, every bucket spans at most
    // half of EACH dimension — the property that makes multi-column
    // min/max pruning effective (a plain x-sort leaves y unconstrained).
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val spans = grid
      .select(shiftright(Bucketing.zOrderKey(col("x"), col("y"), 4), 6).as("bucket"),
        col("x"), col("y"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.length == 4)
    assert(spans.forall { case (xs, ys) => xs <= 7 && ys <= 7 })
  }
}
