package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition pruning must reach the file listing: a filter on the hive
  * partition column becomes a PartitionFilter on the scan (files of
  * other partitions are never opened), while a filter on a data column
  * does not prune. The plan assertion IS the test — at 100 TB the
  * difference between reading one ano/mes directory and reading seven
  * years is exactly this node (see Pipeline.incrementalSilverGold,
  * which relies on it). */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in plan"))

  test("equality filter on the partition column prunes the scan to one partition") {
    val dir = tmpDir("prune")
    val df = (1L to 300L).map(i => (i, s"row$i", (2020 + (i % 3)).toString))
      .toDF("id", "payload", "ano")
    Sinks.writePartitioned(df, dir, partitionBy = Seq("ano"))

    val pruned = spark.read.parquet(dir).where(col("ano") === "2021")
    val scan = scanOf(pruned)
    // the partition predicate must land in PartitionFilters (listing-time),
    // not in dataFilters (row-time)
    assert(scan.partitionFilters.exists(_.toString.contains("2021")),
      s"partitionFilters=${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.toString.contains("2021")),
      s"dataFilters=${scan.dataFilters}")
    // and only that partition's files are actually selected
    val files = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty && files.forall(_.contains("ano=2021")), files.mkString(", "))
    assert(pruned.count() == 100)
  }

  test("filter on a data column does not prune partitions (baseline)") {
    val dir = tmpDir("noprune")
    val df = (1L to 90L).map(i => (i, (i % 3).toString)).toDF("id", "ano")
    Sinks.writePartitioned(df, dir, partitionBy = Seq("ano"))
    val scan = scanOf(spark.read.parquet(dir).where(col("id") <= 10))
    assert(scan.partitionFilters.forall(!_.toString.contains("id")))
    val files = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(Seq("ano=0", "ano=1", "ano=2").forall(p => files.exists(_.contains(p))))
  }
}
