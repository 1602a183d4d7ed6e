package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Planted-duplicate pressure test for d48 semDedup: every corpus in
  * this environment has max pairwise cosine ≈ 0.51 < τ = 0.8, so the
  * scale runs prove pair formation ENGAGES but never that the drop
  * decision FIRES at scale — the keep column is all-true for the honest
  * reason that nothing is a semantic duplicate. This main closes that
  * loop: it plants exact duplicates (identical vector, shifted id — the
  * id shift preserves the min-id policy's direction) for every everyN-th
  * vector, runs the auto-sized operator at τ = 0.8, and asserts the
  * EXACT outcome the planted structure implies:
  *
  *   - every planted row drops (keep = false) with dup_of == its
  *     original (identical vectors share a cell by assignment
  *     determinism, cosine 1.0 ≥ τ; nothing else is within τ because
  *     the natural corpus never crosses it, so the min-id neighbour is
  *     exactly the original);
  *   - every original keeps (its only in-ball neighbour has a LARGER
  *     id);
  *   - zero capped cells (the √n dial's cells stay under the cap).
  *
  * Zero-norm-quantizing vectors are excluded from planting — they keep
  * unconditionally by the documented guard, which would break the
  * planted-must-drop expectation for reasons already covered by
  * SimilaritySpec.
  *
  * Usage: runMain graft.SemDedupPressure <dir> [everyN] — exits
  * non-zero on any assertion failure; prints one JSON line.
  */
object SemDedupPressure {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemDedupPressure <dir> [everyN]")
    val dir = args(0)
    val everyN = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    val shift = maxId + 1
    val planted = emb
      .where(col("vec_id") % everyN === 0 &&
        Similarity.norm(Similarity.quantize(col("embedding"))) > 0)
      .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(planted).localCheckpoint(true)
    val nPlanted = planted.count()
    val n = corpus.count()

    val t0 = System.nanoTime()
    val res = Similarity
      .semDedupAutoSized(corpus, "vec_id", "embedding", minCosine = 0.8,
        nRows = Some(n))
      .localCheckpoint(true)
    val sec = (System.nanoTime() - t0) / 1e9

    val capped = res.where(col("cell_capped")).count()
    val plantedRows = res.where(col("vec_id") > maxId)
    val plantedDropped = plantedRows.where(!col("keep")).count()
    val plantedExact = plantedRows
      .where(!col("keep") && col("dup_of") === col("vec_id") - shift).count()
    val originalsDropped = res.where(col("vec_id") <= maxId && !col("keep")).count()

    val checks = Seq(
      ("planted_all_drop", plantedDropped == nPlanted),
      ("planted_dup_of_exact", plantedExact == nPlanted),
      ("originals_all_keep", originalsDropped == 0L),
      ("no_capped_cells", capped == 0L))
    val failed = checks.filterNot(_._2).map(_._1)
    // Locale.ROOT: the f interpolator is locale-sensitive — a comma
    // decimal separator would break the parseable line (the Bench rule)
    val secStr = String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec))
    println(s"""{"metric":"semdedup_planted","dir":"$dir","n":$n,""" +
      s""""planted":$nPlanted,"dropped":$plantedDropped,""" +
      s""""dup_of_exact":$plantedExact,"originals_dropped":$originalsDropped,""" +
      s""""capped":$capped,"sec":$secStr,""" +
      s""""ok":${failed.isEmpty}${
        if (failed.isEmpty) "" else s""","failed":"${failed.mkString(",")}""""}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
