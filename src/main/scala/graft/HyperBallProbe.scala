package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: interleaved A/B of the PACKED HyperBall register walk
  * (one wide row per node, [[graft.ops.Graph.neighborhoodSizes]])
  * against its sparse row-form twin ([[graft.ops.Graph
  * .neighborhoodSizesRows]]) on the g14/g17 co-purchase graph of a
  * given corpus dir — the measurement behind the round-12 packing
  * decision (g14/g17 were the repo's two heaviest 100× absolutes,
  * 425 s / 342 s, on register-ROW shuffle volume). Interleaved
  * min-of-two with the Bench force action (the A/B discipline: same
  * session, alternating, so box state cancels).
  * Usage: runMain graft.HyperBallProbe [dir] [radius] [reps]
  */
object HyperBallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val radius = if (args.length > 1) args(1).toInt else 2
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // by-name df: the register walks localCheckpoint EAGERLY, so the
    // heavy rounds run at plan-CONSTRUCTION time — the thunk must be
    // evaluated inside the clock or the probe times only the final
    // estimate projection
    def force(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val d = df
      d.select(xxhash64(struct(d.columns.map(col): _*)).as("_h"))
        .agg(expr("bit_xor(_h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def edges() = graft.ops.Graph.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", maxBasketItems = 64)
    // warmup (codegen/classload) on the packed path
    force(graft.ops.Graph.neighborhoodSizes(edges(), radius = 1, p = 4))
    var packed = Double.MaxValue
    var rows = Double.MaxValue
    for (_ <- 1 to reps) {
      packed = math.min(packed,
        force(graft.ops.Graph.neighborhoodSizes(edges(), radius, p = 4)))
      rows = math.min(rows,
        force(graft.ops.Graph.neighborhoodSizesRows(edges(), radius, p = 4)))
    }
    println(f"""{"metric":"hyperball_ab","dir":"$dir","radius":$radius,"packed_sec":$packed%.3f,"rows_sec":$rows%.3f,"speedup":${rows / packed}%.2f}""")
    spark.stop()
  }
}
