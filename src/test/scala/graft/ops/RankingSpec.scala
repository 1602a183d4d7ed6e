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
}
