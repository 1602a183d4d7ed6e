package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("globalRowNumber equals the unpartitioned row_number window (orders, unique key)") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    val got = Ranking.globalRowNumber(orders, Seq(col("o_orderkey")), rankCol = "rn")
      .select(col("o_orderkey"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = orders
      .selectExpr("o_orderkey", "CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("ranks are a dense 1..n permutation even with sparse range partitions") {
    import spark.implicits._
    // 10 rows over 16 requested partitions → most partitions are empty;
    // the prefix sum must treat those as 0, not skip numbers.
    val df = (1 to 10).map(i => (i * 100, s"v$i")).toDF("k", "v")
    val ranked = Ranking.globalRowNumber(df, Seq(col("k")), rankCol = "rn",
      numPartitions = Some(16))
    val rows = ranked.select("k", "rn").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    assert(rows.map(_._2).toSeq == (1L to 10L))
    assert(rows.map(_._1).toSeq == (1 to 10).map(_ * 100))
  }

  test("descending and multi-column orderings rank correctly") {
    import spark.implicits._
    val df = Seq((1, "b"), (1, "a"), (2, "a"), (0, "z")).toDF("k", "s")
    val ranked = Ranking.globalRowNumber(df, Seq(col("k").desc, col("s")), rankCol = "rn",
      numPartitions = Some(3))
    val byRank = ranked.orderBy("rn").select("k", "s").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(byRank == Seq((2, "a"), (1, "a"), (1, "b"), (0, "z")))
  }

  test("the plan has no Window and no single-partition exchange (the trap this op replaces)") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"))
    val ranked = Ranking.globalRowNumber(orders, Seq(col("o_orderkey")), rankCol = "rn")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("empty input yields an empty ranked frame") {
    import spark.implicits._
    val df = Seq.empty[(Int, String)].toDF("k", "v")
    assert(Ranking.globalRowNumber(df, Seq(col("k"))).count() == 0L)
  }

  test("segmentedRunningSum bit-equals the plain running window, hot key included") {
    import spark.implicits._
    // one hub key with many rows across few segments + normal keys with
    // one row per segment + a segment shared at identical (seg) with
    // within-seg order deciding the prefix
    val rows = (1 to 200).map(i => ("hub", i % 5, i.toLong, (i * 7 % 13).toLong)) ++
      Seq(("a", 0, 1L, 5L), ("a", 1, 2L, 7L), ("b", 3, 1L, 11L))
    val df = rows.toDF("k", "seg", "ord", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seg"), col("ord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val plain = df.select(col("k"), col("seg"), col("ord"),
        sum(col("v")).over(w).as("run"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val seg = Ranking.segmentedRunningSum(df, "k", "seg", Seq(col("ord")),
        col("v"), "run")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        r.getAs[Long]("run")).toMap
    assert(seg == plain)
  }

  test("segmentedRunningSum: null values contribute 0 and the output is never null (pinned semantics)") {
    import spark.implicits._
    val df = Seq(("k", 0, 1L, null.asInstanceOf[java.lang.Long]),
      ("k", 0, 2L, java.lang.Long.valueOf(5L)),
      ("k", 1, 3L, null.asInstanceOf[java.lang.Long]))
      .toDF("k", "seg", "ord", "v")
    val got = Ranking.segmentedRunningSum(df, "k", "seg", Seq(col("ord")),
        col("v"), "run")
      .orderBy(col("seg"), col("ord"))
      .collect().map(r => r.getAs[Long]("run")).toSeq
    // plain window would yield NULL at the first row; this op pins 0
    assert(got == Seq(0L, 5L, 5L))
  }

  test("segmentedRunningSum: null keys and null segments are carried, matching the plain window's partitions") {
    import spark.implicits._
    // a null KEY forms its own window partition and a null SEGMENT
    // sorts first within a key — a plain equi-join on (key, segment)
    // would drop all four null-bearing rows (null never equals null)
    val df = Seq(
      (null.asInstanceOf[String], Integer.valueOf(0), 1L, 3L),
      (null.asInstanceOf[String], Integer.valueOf(0), 2L, 4L),
      (null.asInstanceOf[String], Integer.valueOf(1), 3L, 5L),
      ("k", null.asInstanceOf[Integer], 1L, 7L),
      ("k", Integer.valueOf(2), 2L, 11L))
      .toDF("k", "seg", "ord", "v")
    val got = Ranking.segmentedRunningSum(df, "k", "seg", Seq(col("ord")),
      col("v"), "run")
    assert(got.count() == 5, "null-key/segment rows must not be dropped")
    val byRow = got.collect()
      .map(r => (Option(r.getString(0)), Option(r.getAs[Integer]("seg")),
        r.getLong(2)) -> r.getAs[Long]("run")).toMap
    assert(byRow((None, Some(0), 1L)) == 3L)
    assert(byRow((None, Some(0), 2L)) == 7L)
    assert(byRow((None, Some(1), 3L)) == 12L)
    // null segment sorts FIRST (Spark asc nulls-first), so it is the
    // key's prefix and the later segment stacks on top of it
    assert(byRow((Some("k"), None, 1L)) == 7L)
    assert(byRow((Some("k"), Some(2), 2L)) == 18L)
  }

  test("segmentedRunningSum plan: raw rows shuffle on (key, segment), never on key alone") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val plan = Ranking.segmentedRunningSum(orders, "o_custkey", "o_orderdate",
        Seq(col("o_orderkey")), col("o_totalprice").cast("long"), "run")
      .queryExecution.executedPlan.toString
    // the raw-row window's exchange must carry BOTH columns (a key-only
    // hashpartitioning of raw rows would recreate the hot-key funnel
    // this operator exists to avoid); the per-key offset window keys on
    // key alone BY DESIGN but only over per-segment aggregate rows
    assert("hashpartitioning\\(o_custkey#\\d+L?, o_orderdate#\\d+".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("runningSumAuto: uniform keys probe to the plain one-exchange window, a hot key to the segmented form — identical results") {
    import spark.implicits._
    val rows = (1 to 200).map(i => ("hub", i % 5, i.toLong, (i * 7 % 13).toLong)) ++
      Seq(("a", 0, 1L, 5L), ("a", 1, 2L, 7L), ("b", 3, 1L, 11L))
    val df = rows.toDF("k", "seg", "ord", "v")
    def asMap(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        r.getAs[Long]("run")).toMap
    // the hub key holds 200/203 of the table: the probe must pick the
    // segmented branch (its plan has the offset join; plain has none)
    val auto = Ranking.runningSumAuto(df, "k", "seg", Seq(col("ord")),
      col("v"), "run")
    assert(auto.queryExecution.executedPlan.toString.contains("Join"),
      "hot key must dispatch to the segmented (join-bearing) form")
    // saltOverride 1 forces the plain branch; results must be identical
    // (the dispatch-never-changes-results rule)
    val plain = Ranking.runningSumAuto(df, "k", "seg", Seq(col("ord")),
      col("v"), "run", saltOverride = Some(1L))
    assert(!plain.queryExecution.executedPlan.toString.contains("Join"),
      "uniform probe must keep the plain one-exchange window")
    assert(asMap(auto) == asMap(plain))
    // both branches pin the null-value semantics: null contributes 0
    val nulls = Seq(("k", 0, 1L, null.asInstanceOf[java.lang.Long]),
      ("k", 0, 2L, java.lang.Long.valueOf(5L)))
      .toDF("k", "seg", "ord", "v")
    val gotPlain = Ranking.runningSumAuto(nulls, "k", "seg", Seq(col("ord")),
        col("v"), "run", saltOverride = Some(1L))
      .orderBy(col("ord")).collect().map(_.getAs[Long]("run")).toSeq
    assert(gotPlain == Seq(0L, 5L))
  }

  test("rankEnsemble: hand-computed mean ranks; ties broken by id; distinct signal names enforced") {
    import spark.implicits._
    // signals higher-is-better: a = (30, 10, 20), b = (1, 3, 2) on ids 1..3
    val df = Seq((1L, 30L, 1L), (2L, 10L, 3L), (3L, 20L, 2L))
      .toDF("id", "sa", "sb")
    val got = Ranking.rankEnsemble(df, "id",
        Seq("a" -> col("sa"), "b" -> col("sb")))
      .select(col("id"), col("rank_a"), col("rank_b"),
        col("mean_rank_milli"), col("ensemble_rank"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // ranks a: id1=1, id3=2, id2=3; ranks b: id2=1, id3=2, id1=3
    // means (milli): id1 (1+3)*1000/2=2000, id2 2000, id3 2000 — all tie,
    // ensemble order falls back to id
    assert(got == Set(
      (1L, 1L, 3L, 2000L, 1L),
      (2L, 3L, 1L, 2000L, 2L),
      (3L, 2L, 2L, 2000L, 3L)), s"got $got")
    // a decisive corpus: signal b flipped so both agree
    val df2 = Seq((1L, 30L, 3L), (2L, 10L, 1L), (3L, 20L, 2L))
      .toDF("id", "sa", "sb")
    val e2 = Ranking.rankEnsemble(df2, "id",
        Seq("a" -> col("sa"), "b" -> col("sb")))
      .select(col("id"), col("ensemble_rank")).as[(Long, Long)].collect().toMap
    assert(e2 == Map(1L -> 1L, 3L -> 2L, 2L -> 3L), s"got $e2")
    intercept[IllegalArgumentException] {
      Ranking.rankEnsemble(df, "id", Seq("a" -> col("sa"), "a" -> col("sb")))
    }
    intercept[IllegalArgumentException] {
      Ranking.rankEnsemble(df, "id", Seq("a" -> col("sa")))
    }
  }
}
