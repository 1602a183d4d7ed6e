package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (throwaway-grade, kept for re-dialing): peel the sf-dir
  * co-purchase graph at several k values, printing rounds-to-fixpoint,
  * surviving edges, and support range — the dial probe for the g15
  * registry entry (k must actually peel AND converge inside the
  * contractual unroll budget at every gate scale).
  * Usage: runMain graft.TrussProbe [sfDir] [k ...]
  */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 20, 40, 60)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.ops.Graph.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", maxBasketItems = 64)
      .localCheckpoint(true)
    println(s"[truss-probe] edges: ${e.count()}")
    for (k <- ks) {
      // re-implement the peel loop with round logging (kTruss hides it)
      var cur = e
      var n = cur.count()
      var iter = 0
      var converged = false
      while (!converged && iter < 20) {
        val kept = graft.ops.Graph.edgeSupport(cur)
          .where(col("support") >= lit((k - 2).toLong))
          .localCheckpoint(true)
        val nn = kept.count()
        converged = nn == n
        cur = kept.select(col("u"), col("v"))
        n = nn
        iter += 1
        println(s"[truss-probe] k=$k round $iter -> $nn edges")
      }
      println(s"[truss-probe] k=$k: rounds=$iter edges=$n converged=$converged")
    }
    spark.stop()
  }
}
