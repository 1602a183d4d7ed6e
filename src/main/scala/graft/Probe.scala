package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: evaluate ONE registered query against a corpus dir, time
  * the evaluation-complete force (the Bench action), and print the row
  * count plus top value-counts for any requested columns — the quick
  * way to check an audited dial's ENGAGEMENT at a scale the oracle
  * can't reach (e.g. d48's keep/cell_capped split on the 100× corpus,
  * where the DuckDB k-means replay would take hours).
  * Usage: runMain graft.Probe <dir> <queryName> [summaryCol...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Probe <dir> <queryName> [summaryCol...]")
    val (dir, name, summaryCols) = (args(0), args(1), args.drop(2).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df = fn(spark, dir)
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("_h"))
      .agg(expr("bit_xor(_h)")).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // ONE more execution, materialized: the count and every summary
    // column read the checkpointed result instead of re-running the
    // whole pipeline (2 + |summaryCols| times — for the heavy scale
    // probes this tool exists for, each rerun is minutes, and for the
    // connector round-trips each rerun rewrites the sink)
    val out = fn(spark, dir).localCheckpoint(true)
    val rows = out.count()
    println(f"[probe] $name on $dir: ${sec}%.2f s, $rows rows")
    summaryCols.foreach { c =>
      val top = out.groupBy(col(c)).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(10).collect()
        .map(r => s"${r.get(0)}=${r.getLong(1)}").mkString(", ")
      println(s"[probe]   $c: $top")
    }
    spark.stop()
  }
}
