package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val big = Seq(
    (1L, 100L), (1L, 101L), (1L, 102L), (1L, 103L), // hot key
    (2L, 200L), (3L, 300L)
  ).toDF("k", "payload")
  private val small = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "name")

  test("salted inner join result equals the plain join") {
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInner(big, small, "k", factor = 3,
        saltSource = Seq("payload"))
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.size == 6)
  }

  test("salt spreads the hot key's rows over multiple buckets deterministically") {
    val salts = big.where(col("k") === 1L)
      .withColumn("_salt", pmod(xxhash64(col("payload")), lit(3)).cast("int"))
      .select("_salt").as[Int].collect()
    assert(salts.distinct.length > 1) // hot key no longer lands on one reducer
    val again = big.where(col("k") === 1L)
      .withColumn("_salt", pmod(xxhash64(col("payload")), lit(3)).cast("int"))
      .select("_salt").as[Int].collect()
    assert(salts.toSeq == again.toSeq) // deterministic: retries repartition identically
  }

  test("two-phase count equals plain count per key") {
    val plain = big.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoPhase = SkewJoin.twoPhaseCount(big, "k", factor = 3, saltSource = Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twoPhase == plain)
  }

  test("approx sketches land within documented error of exact answers") {
    val df = spark.range(0, 10000).select(
      (col("id") % 1000).as("k"), col("id").cast("double").as("v"))
    val r = df.agg(
      approx_count_distinct(col("k")).as("acd"),
      expr("approx_percentile(v, 0.5, 10000)").as("p50")).collect()(0)
    assert(math.abs(r.getLong(0) - 1000L) <= 50)        // HLL rsd default 5%
    assert(math.abs(r.getDouble(1) - 4999.5) <= 10.0)   // high-accuracy t-digest-ish
  }

  test("skewReport ranks heavy keys with exact shares and mean-reducer salt factors") {
    import spark.implicits._
    // hot key: 600 of 1000 rows; two warm keys; 100 singletons
    val rows = (Seq.fill(600)("hot") ++ Seq.fill(200)("warm1") ++
      Seq.fill(100)("warm2") ++ (1 to 100).map(i => s"cold$i")).toDF("k")
    val got = SkewJoin.skewReport(rows, "k", topK = 3, numPartitions = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // hot: 600/1000 = 600000 ppm; mean reducer = 100 rows -> salt 6
    assert(got("hot") == ((600L, 1L, 600000L, 6L)))
    assert(got("warm1") == ((200L, 2L, 200000L, 2L)))
    // warm2 exactly fills one mean reducer -> salt 1 (no widening needed)
    assert(got("warm2") == ((100L, 3L, 100000L, 1L)))
  }

  test("saltedInnerAuto: probes the factor from the data, equals the plain join in both regimes") {
    import spark.implicits._
    val small = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2"))
      .toDF("k", "name")
    def plainSorted(big: org.apache.spark.sql.DataFrame) =
      big.join(small, Seq("k")).groupBy(col("name"))
        .agg(count(lit(1)).as("n")).orderBy("name")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def autoSorted(big: org.apache.spark.sql.DataFrame, maxFactor: Int = 64) =
      SkewJoin.saltedInnerAuto(big, small, "k", Seq("id"), maxFactor)
        .groupBy(col("name")).agg(count(lit(1)).as("n")).orderBy("name")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // skewed: 800 hot + 200 cold rows — the probe must widen and the
    // result must still equal the plain join
    val skewed = ((1 to 800).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => ("cold1", i.toLong)) ++
      (1 to 100).map(i => ("cold2", i.toLong))).toDF("k", "id")
    assert(autoSorted(skewed) == plainSorted(skewed))
    // uniform: every key at mean size probes to factor 1 — no explode
    val uniform = (1 to 300).map(i =>
      (Seq("hot", "cold1", "cold2")(i % 3), i.toLong)).toDF("k", "id")
    assert(autoSorted(uniform) == plainSorted(uniform))
    // the clamp bounds the small-side amplification
    assert(autoSorted(skewed, maxFactor = 2) == plainSorted(skewed))
  }
}
