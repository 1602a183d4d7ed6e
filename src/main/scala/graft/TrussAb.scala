package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: interleaved A/B of the decremental k-truss peel
  * ([[graft.ops.Graph.kTrussDelta]]) against the full-recompute peel
  * ([[graft.ops.Graph.kTruss]]) on a corpus dir's co-purchase graph —
  * the round-12 verdict item 7 measurement (g15 is the slowest bench
  * query and its 10×-skew instance holds a 1.71M-edge core for 10
  * rounds, exactly the shape where per-round delta work should beat
  * per-round full intersection). Same-session alternating min-of-two
  * with the Bench force action, result sets asserted equal.
  * Usage: runMain graft.TrussAb [dir] [k] [maxIter] [reps]
  */
object TrussAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val maxIter = if (args.length > 2) args(2).toInt else 10
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val d = df
      val h = d.select(xxhash64(struct(d.columns.map(col): _*)).as("_h"))
        .agg(expr("bit_xor(_h)")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, if (h.isNullAt(0)) 0L else h.getLong(0))
    }
    def edges() = graft.ops.Graph.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", maxBasketItems = 64)
    // warmup (codegen/classload)
    force(graft.ops.Graph.kTruss(edges(), k = 3, maxIter = 2, strict = false))
    var full = Double.MaxValue
    var delta = Double.MaxValue
    var hFull = 0L
    var hDelta = 0L
    for (_ <- 1 to reps) {
      val (a, ha) = force(graft.ops.Graph.kTruss(edges(), k, maxIter))
      val (b, hb) = force(graft.ops.Graph.kTrussDelta(edges(), k, maxIter))
      full = math.min(full, a); delta = math.min(delta, b)
      hFull = ha; hDelta = hb
    }
    require(hFull == hDelta,
      s"A/B result hashes differ: full=$hFull delta=$hDelta — NOT shippable")
    println(f"""{"metric":"truss_ab","dir":"$dir","k":$k,"full_sec":$full%.3f,"delta_sec":$delta%.3f,"speedup":${full / delta}%.2f,"hash_equal":true}""")
    spark.stop()
  }
}
