package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Determinism: embeddings are quantized to integer "millis"
  * (round(x*1000) per element) before any arithmetic. Integer-valued
  * doubles below 2^53 sum EXACTLY in any order, so dot products and
  * cosine scores are bit-identical across partitionings and across
  * engines — unlike raw float sums, whose result depends on reduction
  * order.
  *
  * Scale path: brute force is one broadcast of the (tiny) query set and a
  * single scan — the right plan up to ~billions of rows × small query
  * count. For large query sets, `lshBucketed` bit-samples deterministic
  * hyperplanes so both sides shuffle once on the bucket key.
  */
object Similarity {

  /** Quantized copy of an array<float> column: array<double> of integer values. */
  def quantize(emb: Column): Column =
    transform(emb.cast("array<double>"), x => round(x * 1000, 0))

  /** Exact dot product of two quantized vectors (order-independent). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force top-k cosine neighbours of one query vector (given as a
    * one-row DataFrame with the same embedding column), excluding the
    * query row itself. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, embCol: String,
      query: DataFrame, queryIdCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(
      col(queryIdCol).as("_qid"), quantize(col(embCol)).as("_qe")))
    embeddings
      .select(col(idCol), quantize(col(embCol)).as("_e"))
      .crossJoin(q)
      .where(col(idCol) =!= col("_qid"))
      .select(col(idCol), cosine(col("_e"), col("_qe")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash mapped to {-1, +1} — reproducible across runs with no
    * stored model. */
  private def planeSign(plane: Column, dim: Column): Column =
    when(xxhash64(plane, dim).bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-random-projection bucket (nPlanes-bit code) over an
    * ALREADY-QUANTIZED embedding attribute — vectors in the same bucket
    * are ANN candidates. Pass a bound column, not a derived expression
    * (lambda splicing re-evaluates derived subtrees per element). */
  def srpBucketQ(q: Column, nPlanes: Int): Column =
    aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0L),
      (acc, p) => acc + when(
        aggregate(zip_with(q, transform(sequence(lit(0), size(q) - 1),
          d => planeSign(p, d)), (x, s) => x * s), lit(0.0), (a, x) => a + x) > 0,
        call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(0L))

  /** Embedding near-duplicate pairs: SRP-bucket every vector once (one
    * narrow projection), self-join within bucket, keep pairs whose exact
    * cosine clears the threshold. The scale shape of embedding dedup:
    * candidate generation is a single shuffle on the bucket key; the
    * O(n²) cosine work only happens inside buckets. Recall < 1 by design
    * (same-bucket requirement) — raise nPlanes for fewer candidates,
    * lower it for higher recall. */
  def embeddingNearDups(embeddings: DataFrame, idCol: String, embCol: String,
      minCosine: Double, nPlanes: Int = 4): DataFrame = {
    val bucketed = embeddings
      .select(col(idCol).as("_id"), quantize(col(embCol)).as("_e"))
      .select(col("_id"), col("_e"), srpBucketQ(col("_e"), nPlanes).as("_bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a._bucket") === col("b._bucket") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        cosine(col("a._e"), col("b._e")).as("cos_sim"))
      .where(col("cos_sim") >= minCosine)
  }

  /** LSH-bucketed ANN: shuffle both sides once on the SRP bucket, rank
    * candidates within the bucket by exact cosine. Recall < 1 by design;
    * the bucket code width trades recall for candidate count. */
  def lshBucketed(embeddings: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, k: Int, nPlanes: Int = 8): DataFrame = {
    // quantize once per row, then bucket over the bound attribute
    val data = embeddings
      .select(col(idCol).as("data_id"), quantize(col(embCol)).as("_e"))
      .select(col("data_id"), col("_e"), srpBucketQ(col("_e"), nPlanes).as("_bucket"))
    val qs = queries
      .select(col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id"), col("_qe"), srpBucketQ(col("_qe"), nPlanes).as("_bucket"))
    val scored = data.join(qs, Seq("_bucket"))
      .where(col("data_id") =!= col("query_id"))
      .select(col("query_id"), col("data_id"),
        cosine(col("_e"), col("_qe")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("data_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
