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
}
