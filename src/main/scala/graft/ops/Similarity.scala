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

  /** Exact dot product of two quantized vectors (order-independent):
    * the native codegen expression graft_dot, built directly (works in
    * any session, no registration); values are identical to the
    * zip_with/aggregate fold. */
  def dot(a: Column, b: Column): Column =
    graft.functions.TextHashExpressions.dotProduct(a, b)

  /** Pure-builtin dot product — fallback + cross-check for graft_dot. */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Norm of a quantized vector — projected ONCE per row before any
    * pairwise stage. cosine(a,b) inside a pair join would recompute both
    * self-dots per PAIR (3× the multiplies, and the per-row norms are
    * pair-invariant); dot/(norm_a*norm_b) over precomputed norms is the
    * scale-correct shape. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force top-k cosine neighbours of one query vector (given as a
    * one-row DataFrame with the same embedding column), excluding the
    * query row itself. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, embCol: String,
      query: DataFrame, queryIdCol: String, k: Int): DataFrame = {
    val q = broadcast(query
      .select(col(queryIdCol).as("_qid"), quantize(col(embCol)).as("_qe"))
      .select(col("_qid"), col("_qe"), norm(col("_qe")).as("_qn")))
    embeddings
      .select(col(idCol), quantize(col(embCol)).as("_e"))
      .select(col(idCol), col("_e"), norm(col("_e")).as("_n"))
      .crossJoin(q)
      .where(col(idCol) =!= col("_qid"))
      .select(col(idCol), (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Brute-force top-k per query over a SMALL query set — the exact
    * ground-truth leg for recall evaluation (d82) and the multi-query
    * sibling of [[bruteForceTopK]]: broadcast the queries, one corpus
    * scan scores all of them, and the per-query rank window collapses
    * map-side (Spark's WindowGroupLimit pushes `rank <= k` below the
    * shuffle — the d71/d76 discipline), so the shuffled volume is
    * O(k · nQueries) regardless of corpus size. Ties break on data_id,
    * the d10 contract. Output: (query_id, data_id, cos_sim, rank). */
  def bruteForceTopKGrouped(embeddings: DataFrame, idCol: String,
      embCol: String, queries: DataFrame, queryIdCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id"), col("_qe"), norm(col("_qe")).as("_qn")))
    val scored = embeddings
      .select(col(idCol).as("data_id"), quantize(col(embCol)).as("_e"))
      .select(col("data_id"), col("_e"), norm(col("_e")).as("_n"))
      .crossJoin(q)
      .where(col("data_id") =!= col("query_id"))
      .select(col("query_id"), col("data_id"),
        (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("data_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Deterministic Rademacher (±1) hyperplane matrix for (plane, dim) —
    * sign = parity of the first md5 half of "srp:plane:dim", the SAME
    * little-endian half as the dedup hash chain (graft.functions.Md5Mix),
    * so the whole SRP bucketing is reproducible in DuckDB SQL
    * (`md5_number_upper('srp:' || p || ':' || d) & 1`) — which is what
    * gives d07/d08 full oracles. ±1 projections are the standard
    * Achlioptas-style SRP variant (sign-of-dot preserves angles the same
    * way Gaussian planes do). Computed ONCE on the driver and shipped as
    * a literal — the earlier formulation re-hashed every (plane, dim)
    * cell per ROW, nPlanes × dim wasted hashes on every vector in a
    * 100 TB scan. Reproducible across runs and engines, no stored model.
    */
  def planeMatrix(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    import org.apache.spark.unsafe.types.UTF8String
    Seq.tabulate(nPlanes) { p =>
      Seq.tabulate(dim) { d =>
        val h = graft.functions.Md5Mix.halves(UTF8String.fromString(s"srp:$p:$d"))(0)
        if ((h & 1L) == 1L) 1.0 else -1.0
      }
    }
  }

  /** Sign-random-projection bucket (nPlanes-bit code) over an
    * ALREADY-QUANTIZED embedding attribute — vectors in the same bucket
    * are ANN candidates. Pass a bound column, not a derived expression
    * (lambda splicing re-evaluates derived subtrees per element). */
  def srpBucketQ(q: Column, nPlanes: Int, dim: Int): Column = {
    val planes = typedlit(planeMatrix(nPlanes, dim))
    aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0L),
      (acc, p) => acc + when(
        dot(q, element_at(planes, (p + 1).cast("int"))) > 0,
        call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(0L))
  }

  /** LSH amplification: nTables independent nPlanes-bit SRP codes per
    * vector. A pair collides if it shares any table's bucket (recall
    * 1-(1-p^k)^L instead of p^k), which is what lets the code width stay
    * selective (few candidates per bucket) while recall stays high.
    * Table t uses planes [t·nPlanes, (t+1)·nPlanes) of one deterministic
    * matrix. Returns array<long> of the nTables codes (index = table id)
    * — computed by the native one-pass graft_srp_codes expression; the
    * composed transform×aggregate×dot form runs nTables·nPlanes
    * interpreted lambda frames per row on this exact hot loop. */
  def srpTableCodes(q: Column, nTables: Int, nPlanes: Int, dim: Int): Column =
    graft.functions.TextHashExpressions.srpCodes(
      q, planeMatrix(nTables * nPlanes, dim).map(_.toArray).toArray, nTables)

  /** Composed-builtin form of [[srpTableCodes]] as array<struct> — kept
    * as the semantics cross-check for the native expression. */
  def srpTableBucketsQ(q: Column, nTables: Int, nPlanes: Int, dim: Int): Column = {
    val planes = typedlit(planeMatrix(nTables * nPlanes, dim))
    transform(sequence(lit(0), lit(nTables - 1)), t =>
      struct(t.cast("int").as("tbl"),
        aggregate(
          sequence(lit(0), lit(nPlanes - 1)),
          lit(0L),
          (acc, p) => acc + when(
            dot(q, element_at(planes, (t * nPlanes + p + 1).cast("int"))) > 0,
            call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(0L))
          .as("bucket")))
  }

  /** Multi-probe expansion of one bucket code: the code itself plus every
    * 1-bit flip (multiProbeBits = 1) — probing neighbouring buckets
    * recovers most of the recall a wider code costs, for an nPlanes+1
    * candidate-key fan-out on ONE side of the join only. */
  def probeBuckets(bucket: Column, nPlanes: Int, multiProbeBits: Int): Column = {
    require(multiProbeBits >= 0 && multiProbeBits <= 1,
      s"multiProbeBits ($multiProbeBits) — only 0 (exact) and 1 (1-bit flips) are supported")
    if (multiProbeBits == 0) array(bucket)
    else concat(array(bucket),
      transform(sequence(lit(0), lit(nPlanes - 1)),
        p => bucket.bitwiseXOR(call_function("shiftleft", lit(1L), p.cast("int")))))
  }

  /** Window-count bucket guard over (tbl, bucket): same contract as
    * Dedup.capBuckets — drop degenerate buckets before a pair join,
    * audited via [[nearDupBucketOverflow]], never silently quadratic. */
  private def capTableBuckets(df: DataFrame, maxBucketSize: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_tbl"), col("_bucket"))
    df.withColumn("_bn", count(lit(1)).over(w))
      .where(col("_bn") <= maxBucketSize)
      .drop("_bn")
  }

  /** Embedding dimensionality from the first row with a non-empty
    * vector — an early-stopping limit(1) scan, not a full aggregate.
    * Empty input (or all-null vectors) → 0: planeMatrix degenerates to
    * empty planes, which is harmless because there are no rows to
    * bucket. */
  def embeddingDim(df: DataFrame, embCol: String): Int = {
    val rows = df.select(size(col(embCol)).as("_dim")).where(col("_dim") > 0)
      .limit(1).collect()
    if (rows.isEmpty) 0 else rows(0).getInt(0)
  }

  /** (id, e, n, tbl, bucket) rows — one per (vector, table); the table
    * id is the position in the native codes array (posexplode). */
  private def tableBucketed(embeddings: DataFrame, idCol: String, embCol: String,
      nTables: Int, nPlanes: Int, dim: Int): DataFrame =
    embeddings
      .select(col(idCol).as("_id"), quantize(col(embCol)).as("_e"))
      .select(col("_id"), col("_e"), norm(col("_e")).as("_n"),
        posexplode(srpTableCodes(col("_e"), nTables, nPlanes, dim)))
      .withColumnRenamed("pos", "_tbl")
      .withColumnRenamed("col", "_bucket")

  /** Embedding near-duplicate pairs: SRP-bucket every vector once (one
    * narrow projection), self-join within bucket, keep pairs whose exact
    * cosine clears the threshold. The scale shape of embedding dedup:
    * candidate generation is a single shuffle on the (table, bucket) key;
    * the O(n²) cosine work only happens inside buckets.
    *
    * Recall/cost dial: a pair is a candidate iff some table's codes are
    * within multiProbeBits of each other. Wider codes (nPlanes) cut
    * candidate volume ~2× per bit; more tables and 1-bit probing buy the
    * recall back (1-(1-p')^L for per-table hit rate p'). The defaults
    * (12-bit codes × 4 tables × 1-bit probe) target true near-dups
    * (cos ≥ 0.9, per-pair hit rate ≈ 0.96); for moderate-similarity
    * mining drop nPlanes to ~6. `maxBucketSize` drops degenerate buckets
    * before the join — audit with [[nearDupBucketOverflow]]. */
  def embeddingNearDups(embeddings: DataFrame, idCol: String, embCol: String,
      minCosine: Double, nPlanes: Int = 12, nTables: Int = 4,
      multiProbeBits: Int = 1, maxBucketSize: Int = 10000): DataFrame = {
    val dim = embeddingDim(embeddings, embCol)
    val bucketed = capTableBuckets(
      tableBucketed(embeddings, idCol, embCol, nTables, nPlanes, dim), maxBucketSize)
    // one side keeps its exact code, the other probes its 1-bit
    // neighbourhood — together they cover code pairs within hamming 1.
    // The probe side is NOT re-capped on the probe key: the exact-bucket
    // cap already bounds every neighbour bucket's membership, so join
    // rows per (tbl, bucket) are ≤ cap² · (nPlanes + 1) — while a
    // probe-key cap would drop a small bucket's own exact rows whenever
    // its 1-bit neighbourhood is populous (losing true pairs that
    // nearDupBucketOverflow, which counts exact membership, would never
    // report).
    val probed = bucketed.select(col("_id"), col("_e"), col("_n"), col("_tbl"),
      explode(probeBuckets(col("_bucket"), nPlanes, multiProbeBits)).as("_bucket"))
    val a = bucketed.alias("a")
    val b = probed.alias("b")
    a.join(b, col("a._tbl") === col("b._tbl") && col("a._bucket") === col("b._bucket") &&
        col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        (dot(col("a._e"), col("b._e")) / (col("a._n") * col("b._n"))).as("cos_sim"))
      .where(col("cos_sim") >= minCosine)
      .dropDuplicates("id_a", "id_b")
  }

  /** [[embeddingNearDups]] with the code width SIZED TO THE CORPUS —
    * the 100 TB form. A fixed nPlanes is a scale trap: expected bucket
    * size is n/2^p, so cost grows as n²/2^p through a quadratic-pain
    * regime and then, once buckets cross maxBucketSize, the cap drops
    * them ALL and recall collapses to zero — measured on the 100×
    * corpus (2.06 M vectors), the registered d08 dial (6-bit codes)
    * took 606 s with every surviving bucket at the cap boundary, vs
    * the auto-sized run recorded in BASELINE.md. Sizing
    * p = ceil(log2(n / targetBucketSize)) holds expected bucket size
    * constant, making candidate volume ≈ n · targetBucketSize · (p+1)
    * · nTables — linear in n with the 1-bit-probe log fan-out.
    *
    * The price is the LSH recall law: per-table hit rate is
    * collide^p with collide = 1 − θ/π per plane, so wider codes lower
    * per-table recall — amplification (nTables, cost linear in L) is
    * the knob that buys it back, NOT narrower codes. For true near-dup
    * thresholds (cos ≥ 0.9, collide ≈ 0.86) the defaults hold recall
    * usefully to hundreds of millions of vectors; for
    * moderate-similarity mining at corpus scale use
    * [[portableIvfTopK]] instead — SRP-LSH is the wrong tool there at
    * any dial.
    *
    * The one driver action is an exact count() (the d10 trainCap
    * class of bounded probe); pass `nRows` to skip it when the caller
    * already knows the cardinality. */
  def embeddingNearDupsAutoSized(embeddings: DataFrame, idCol: String,
      embCol: String, minCosine: Double, targetBucketSize: Int = 8,
      nTables: Int = 4, multiProbeBits: Int = 1, maxBucketSize: Int = 10000,
      nRows: Option[Long] = None): DataFrame = {
    require(targetBucketSize >= 1, s"targetBucketSize must be >= 1, got $targetBucketSize")
    val n = nRows.getOrElse(embeddings.count())
    embeddingNearDups(embeddings, idCol, embCol, minCosine,
      autoPlanes(n, targetBucketSize), nTables, multiProbeBits, maxBucketSize)
  }

  /** ceil(log2(n / targetBucketSize)) clamped to [6, 30] — 6 keeps tiny
    * corpora from degenerating to 1-bucket tables, 30 bounds the plane
    * matrix (a driver literal) at any conceivable corpus.
    *
    * Computed in INTEGER arithmetic (ceil-divide, then bit length of
    * buckets−1), never floating log: ceil(log2(ceil(n/t))) equals
    * ceil(log2(n/t)) exactly (no power of two lies strictly between a
    * real and its ceiling), and the integer form is what lets a DuckDB
    * oracle reproduce the width bit-for-bit at a power-of-two boundary,
    * where log(2^k)/log(2) may land on either side of k in IEEE. */
  def autoPlanes(n: Long, targetBucketSize: Int): Int = {
    val buckets = (n + targetBucketSize - 1) / targetBucketSize
    val raw =
      if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
    math.max(6, math.min(30, raw))
  }

  /** Buckets embeddingNearDups would drop at this cap, with sizes. */
  def nearDupBucketOverflow(embeddings: DataFrame, idCol: String, embCol: String,
      nPlanes: Int = 12, nTables: Int = 4, maxBucketSize: Int = 10000): DataFrame = {
    val dim = embeddingDim(embeddings, embCol)
    tableBucketed(embeddings, idCol, embCol, nTables, nPlanes, dim)
      .groupBy(col("_tbl"), col("_bucket"))
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxBucketSize)
  }

  /** IVF (inverted-file) ANN: k-means partitions the vector space into
    * nLists cells; every data vector is assigned to its nearest centroid
    * (the "inverted list"); each query probes only its nProbe nearest
    * cells and ranks those candidates by exact cosine. The other
    * classical ANN scale path next to SRP-LSH: candidate generation is
    * one shuffle on the list id, and recall/cost is tuned by nProbe
    * (probe all lists = exact). Centroids are a tiny driver-side model
    * (nLists × dim), shipped as a broadcast literal; training is one
    * spark.ml KMeans fit with a fixed seed for reproducibility. */
  def ivfTopK(embeddings: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      trainMaxIter: Int = 5): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val data = embeddings.select(
      col(idCol).as("data_id"),
      quantize(col(embCol)).as("_e"),
      array_to_vector(col(embCol).cast("array<double>")).as("_vec"))
    // Training is bounded BOTH ways: few iterations AND a capped row
    // sample. Cell boundaries only gate candidate RECALL, not result
    // correctness (exact cosine re-ranks), so a roughly-converged
    // partition over a bounded sample buys most of the recall — while
    // fitting on the full input would make every k-means iteration a full
    // scan of a 100 TB table. limit() short-circuits the scan after
    // trainCap rows (deterministic for a fixed file layout).
    val trainCap = math.max(10000, 100 * nLists)
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(trainMaxIter)
      .setFeaturesCol("_vec").setPredictionCol("_list")
      .fit(data.select(col("_vec")).limit(trainCap))
    val assigned = model.transform(data)
      .select(col("data_id"), col("_e"), norm(col("_e")).as("_n"), col("_list"))

    // centroid table: nLists rows of (list id, quantized centroid) — a
    // broadcast-sized literal, same quantization as the vectors so the
    // probe distances are exact integer arithmetic
    val centroids = broadcast(embeddings.sparkSession.createDataFrame(
      model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(x => math.round(x * 1000).toDouble))
      }).toDF("_list", "_centroid"))

    // each query probes its nProbe nearest cells (euclidean, matching
    // the k-means training objective)
    val qs = queries.select(
      col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id"), col("_qe"), norm(col("_qe")).as("_qn"))
    val dist2 = aggregate(
      zip_with(col("_qe"), col("_centroid"), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("_d2"), col("_list"))
    val probes = qs.crossJoin(centroids)
      .withColumn("_d2", dist2)
      .withColumn("_pr", row_number().over(probeW))
      .where(col("_pr") <= nProbe)
      .select(col("query_id"), col("_qe"), col("_qn"), col("_list"))

    // one shuffle on the list id; exact cosine within the probed cells
    val scored = assigned.join(probes, Seq("_list"))
      .where(col("data_id") =!= col("query_id"))
      .select(col("query_id"), col("data_id"),
        (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("cos_sim"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("data_id"))
    // no dedup needed: each data vector lives in exactly one cell, and
    // probe lists are distinct (query, cell) pairs
    scored.withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= k)
  }

  /** ENGINE-PORTABLE IVF ANN: the same probe/re-rank shape as
    * [[ivfTopK]], but the cells come from a fully deterministic integer
    * k-means instead of spark.ml — which upgrades the query from
    * rows-only to a hash-exact DuckDB oracle:
    *   - init: the `nLists` training vectors with the smallest
    *     md5(vec_id) (portable ORDER BY md5 LIMIT k);
    *   - training set: the `trainCap` smallest-md5 vectors (TakeOrdered
    *     in the plan — bounded, never a full sort, and content-addressed
    *     so every engine picks the identical sample);
    *   - distance: exact integer arithmetic on the quantized vectors;
    *     assignment ties break on the cell id;
    *   - update: per-dimension floor(sum/count) — sums of integer-valued
    *     doubles are exact, the division and floor are identical IEEE
    *     ops on both engines; empty cells keep their previous centroid;
    *   - fixed `iters` iterations (k-means as a deterministic recurrence,
    *     not a convergence loop).
    * Scale shape: the training sample is fetched with ONE distributed
    * TakeOrdered (never a full sort) and, being driver-sized by
    * definition of trainCap (10k × 64 dims ≈ 5 MB), the iterations run
    * as plain Scala arithmetic on the driver — zero cluster jobs, and
    * bit-identical to the SQL recurrence because every step is exact
    * integer sums plus one IEEE divide+floor. The full table is then
    * touched exactly once: cell assignment is a NARROW projection
    * against the centroid literals (array_min over (d2, list) structs —
    * no crossJoin, no window, zero shuffles on the data side). The
    * centroid state is nLists×dim numbers — the same "tiny model"
    * contract as ivfTopK. Cell quality is a few percent below a
    * converged spark.ml fit (greedy floor-mean updates), which only
    * gates candidate recall — the exact cosine re-rank is unchanged. */
  /** Deterministic integer k-means over the `trainCap` smallest-md5
    * vectors of `data` (columns: an id column named `idName` + quantized
    * `_e`) — the shared portable-cell trainer behind [[ivfTopKPortable]]
    * and [[semDedup]]. ONE bounded TakeOrdered + collect; re-sorted
    * driver-side so the init order never depends on a plan's
    * output-ordering guarantee. Every step is exact integer sums plus
    * one IEEE divide+floor, so the recurrence is bit-identical to the
    * oracle's unrolled CTE form. */
  /** The bounded training collect behind every portable trainer: the
    * `trainCap` smallest-md5 vectors, re-sorted driver-side so the init
    * order never depends on a plan's output-ordering guarantee. */
  private def collectTrainVectors(data: DataFrame, idName: String,
      trainCap: Int): Array[Array[Double]] = data
    .withColumn("_m", md5(col(idName).cast("string")))
    .orderBy(col("_m")).limit(trainCap)
    .select(col("_m"), col("_e")).collect()
    .sortBy(_.getString(0))
    .map(_.getSeq[Double](1).toArray)

  private def trainPortableCentroids(data: DataFrame, idName: String,
      nLists: Int, iters: Int, trainCap: Int): Array[Array[Double]] = {
    val train = collectTrainVectors(data, idName, trainCap)
    require(train.nonEmpty, "need at least one training vector")
    kmeansLocal(train, nLists, iters)
  }

  /** The deterministic integer k-means recurrence itself, over an
    * already-collected training sample (md5-sorted): exact integer
    * sums plus one IEEE divide+floor per (cell, dim) per iteration —
    * bit-identical to the oracle's unrolled CTE form. Shared by the
    * full-vector trainers and [[pqTopK]]'s per-subspace codebooks. */
  private[ops] def kmeansLocal(train: Array[Array[Double]], nLists: Int,
      iters: Int): Array[Array[Double]] = {
    // fewer training vectors than lists → fewer lists, exactly like the
    // oracle's `rn <= nl` filter over a shorter tr (a throw here would
    // diverge from the oracle on a tiny corpus)
    val effLists = math.min(nLists, train.length)
    var centroids: Array[Array[Double]] = train.take(effLists).map(_.clone())
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
      s // exact: integer-valued terms, sums far below 2^53
    }
    for (_ <- 0 until iters) {
      // argmin cell per training vector; ties break on the cell id
      // because the scan takes the FIRST strictly-smaller distance
      val sums = Array.fill(effLists)(new Array[Double](
        if (train.isEmpty) 0 else train(0).length))
      val counts = new Array[Long](effLists)
      train.foreach { v =>
        var best = 0; var bestD = sqDist(v, centroids(0)); var i = 1
        while (i < effLists) {
          val d = sqDist(v, centroids(i))
          if (d < bestD) { best = i; bestD = d }
          i += 1
        }
        counts(best) += 1
        var j = 0
        while (j < v.length) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (c, i) =>
        if (counts(i) == 0) c // empty cell keeps its previous centroid
        else sums(i).map(s => math.floor(s / counts(i)))
      }
    }
    centroids
  }

  /** Per-row distance ORDER against the DRIVER-LITERAL centroids — a
    * narrow projection, no broadcast table, no crossJoin, no window.
    * |e−c|² = |e|² − 2e·c + |c|², and |e|² is row-constant, so ranking
    * on (|c|² − 2e·c) gives the identical order AND identical ties as
    * the oracle's full d2 (a monotone shift of exact integer-valued
    * doubles); e·c is the native codegen graft_dot against a literal
    * array — no interpreted lambda in the per-row hot path. Struct
    * ordering (score, list) IS the tie-break, so cell assignment is
    * array_min and the nProbe list is a slice of the sorted array.
    * Zero shuffles on the data side. */
  private def centroidDistStructs(centroids: Array[Array[Double]],
      vec: Column): Column = array(
    centroids.toSeq.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum // exact: integer-valued doubles
      struct(
        (lit(c2) - lit(2.0) * dot(vec, array(c.toSeq.map(lit): _*))).as("score"),
        lit(i).as("list"))
    }: _*)

  def ivfTopKPortable(embeddings: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, iters: Int = 3,
      trainCap: Int = 10000): DataFrame = {
    val data = embeddings.select(
      col(idCol).as("data_id"), quantize(col(embCol)).as("_e"))
    val centroids = trainPortableCentroids(data, "data_id", nLists, iters, trainCap)
    def distStructs(vec: Column): Column = centroidDistStructs(centroids, vec)
    val assigned = data
      .select(col("data_id"), col("_e"), norm(col("_e")).as("_n"),
        array_min(distStructs(col("_e"))).getField("list").as("_list"))
    val qs = queries.select(
      col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id"), col("_qe"), norm(col("_qe")).as("_qn"))
    val probes = qs
      .select(col("query_id"), col("_qe"), col("_qn"),
        explode(slice(array_sort(distStructs(col("_qe"))), 1, nProbe)).as("_p"))
      .select(col("query_id"), col("_qe"), col("_qn"),
        col("_p.list").as("_list"))
    val scored = assigned.join(probes, Seq("_list"))
      .where(col("data_id") =!= col("query_id"))
      .select(col("query_id"), col("data_id"),
        (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("cos_sim"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("data_id"))
    scored.withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= k)
  }

  /** Product-quantization ANN (Jégou et al. 2011): split the embedding
    * into `nSub` contiguous subspaces, learn an `nCentroids`-entry
    * codebook per subspace with the SAME deterministic integer k-means
    * as [[ivfTopKPortable]] (one shared md5-ranked training collect,
    * sliced per subspace driver-side), encode every vector as nSub
    * small codes, and answer queries by asymmetric distance: per query,
    * ONE lookup table per subspace (nCentroids scores), then each
    * candidate costs nSub element_at lookups + adds — never a full
    * d-dim distance.
    *
    * THE memory-compressed ANN scale path: at 100 TB the raw float
    * corpus cannot be rescanned per query, but the code table is
    * dim·4bytes → nSub bytes per vector (64× here), small enough to
    * keep hot. Encoding is a narrow zero-shuffle projection against
    * driver-literal codebooks (the IVF discipline); the query scan is
    * a broadcast of the (tiny) LUT-augmented query frame against the
    * code table — no shuffle of the corpus, and the only per-pair work
    * is integer-indexed lookups. Compose with d10's cells for
    * IVF-PQ when even the code scan needs pruning.
    *
    * Determinism: scores rank on Σ_j (|c_j|² − 2·q_j·c_j), the
    * monotone-shift trick of [[centroidDistStructs]] extended to sums:
    * it differs from true ADC distance by Σ_j |q_j|², constant within
    * a query's ranking, so order AND ties are identical to full d² —
    * and every term is an exact integer-valued double (quantized
    * inputs, integer centroids from floor-of-mean), so the sum is
    * bit-exact in any order and the oracle reproduces it to the last
    * bit. Ties break on data_id, the d10 contract. */
  /** Per-subspace codebooks from an already-collected training sample:
    * (subDim, books(nSub)(nCentroids)(subDim)). */
  private def pqBooks(train: Array[Array[Double]], nSub: Int,
      nCentroids: Int, iters: Int): (Int, Array[Array[Array[Double]]]) = {
    require(train.nonEmpty, "need at least one training vector")
    val dim = train(0).length
    require(dim % nSub == 0, s"embedding dim $dim not divisible by nSub=$nSub")
    val subDim = dim / nSub
    (subDim, Array.tabulate(nSub) { j =>
      kmeansLocal(train.map(_.slice(j * subDim, (j + 1) * subDim)),
        nCentroids, iters)
    })
  }

  private def pqSub(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Code columns _c0.._cN for a data row's quantized vector `_e`. */
  private def pqCodeCols(books: Array[Array[Array[Double]]],
      subDim: Int): Seq[Column] = books.indices.map { j =>
    array_min(centroidDistStructs(books(j), pqSub(col("_e"), j, subDim)))
      .getField("list").as(s"_c$j")
  }

  /** LUT columns _l0.._lN for a query row's quantized vector `_qe` —
    * computed ONCE per query; the candidate scan only indexes them. */
  private def pqLutCols(books: Array[Array[Array[Double]]],
      subDim: Int): Seq[Column] = books.indices.map { j =>
    array(books(j).toSeq.map { c =>
      val c2 = c.map(x => x * x).sum // exact: integer-valued doubles
      lit(c2) - lit(2.0) * dot(pqSub(col("_qe"), j, subDim),
        array(c.toSeq.map(lit): _*))
    }: _*).as(s"_l$j")
  }

  /** Σ_j LUT[code_j] in fixed left-assoc order (the oracle's order). */
  private def pqScore(nSub: Int): Column = (0 until nSub)
    .map(j => element_at(col(s"_l$j"), col(s"_c$j").cast("int") + 1))
    .reduceLeft(_ + _)

  private def pqRank(scored: DataFrame, k: Int): DataFrame = {
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_score").asc, col("data_id"))
    scored.withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= k)
  }

  def pqTopK(embeddings: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, k: Int,
      nSub: Int = 4, nCentroids: Int = 8, iters: Int = 2,
      trainCap: Int = 10000): DataFrame = {
    val data = embeddings.select(
      col(idCol).as("data_id"), quantize(col(embCol)).as("_e"))
    val train = collectTrainVectors(data, "data_id", trainCap)
    val (subDim, books) = pqBooks(train, nSub, nCentroids, iters)
    val codes = data.select(col("data_id") +: pqCodeCols(books, subDim): _*)
    val qs = queries
      .select(col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id") +: pqLutCols(books, subDim): _*)
    val scored = codes.crossJoin(broadcast(qs))
      .where(col("data_id") =!= col("query_id"))
      .select(col("query_id"), col("data_id"), pqScore(nSub).as("adc_score"))
    pqRank(scored, k)
  }

  /** IVF-PQ: [[ivfTopKPortable]]'s cell pruning composed with
    * [[pqTopK]]'s compressed ADC scan — the full production ANN shape
    * (Jégou et al. 2011 §IV): the coarse quantizer prunes the corpus
    * to nProbe cells per query, and within the probed cells candidates
    * are scored by code lookups, never by touching a vector. At 100 TB
    * the cell index bounds the scan and the code table bounds the
    * bytes — the two dials compose multiplicatively.
    *
    * ONE training collect feeds both quantizers (cell centroids from
    * the full vectors, per-subspace codebooks from the same sample
    * sliced), mirroring the oracle's single `tr` CTE. The candidate
    * join keys on the cell id with the tiny LUT-augmented probe frame
    * broadcast — the corpus side stays unshuffled. Same monotone-shift
    * exactness contract as pqTopK (ties on data_id). */
  def ivfPqTopK(embeddings: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, cellIters: Int = 3,
      nSub: Int = 4, nCentroids: Int = 8, pqIters: Int = 2,
      trainCap: Int = 10000): DataFrame = {
    val data = embeddings.select(
      col(idCol).as("data_id"), quantize(col(embCol)).as("_e"))
    val train = collectTrainVectors(data, "data_id", trainCap)
    require(train.nonEmpty, "need at least one training vector")
    val cellCents = kmeansLocal(train, nLists, cellIters)
    val (subDim, books) = pqBooks(train, nSub, nCentroids, pqIters)
    val codes = data.select(
      col("data_id") +:
        array_min(centroidDistStructs(cellCents, col("_e")))
          .getField("list").as("_list") +:
        pqCodeCols(books, subDim): _*)
    val probes = queries
      .select(col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id") +:
        explode(slice(array_sort(centroidDistStructs(cellCents, col("_qe"))),
          1, nProbe)).as("_p") +:
        pqLutCols(books, subDim): _*)
      .select(col("query_id") +: col("_p.list").as("_list") +:
        books.indices.map(j => col(s"_l$j")): _*)
    val scored = codes.join(broadcast(probes), Seq("_list"))
      .where(col("data_id") =!= col("query_id"))
      .select(col("query_id"), col("data_id"), pqScore(nSub).as("adc_score"))
    pqRank(scored, k)
  }

  /** Two-stage ANN with exact re-rank ("refine", Jégou et al. 2011 §V):
    * [[ivfPqTopK]] proposes `nCandidates` ids per query from the
    * compressed codes, then ONLY those candidates are re-scored with
    * the exact cosine and the top-k re-ranked — the standard production
    * answer to ADC's quantization error (the codes bound the scan; the
    * refine step restores exact order at per-query-constant cost).
    *
    * Scale shape: stage 1 is the proven IVF-PQ path (corpus side never
    * shuffles); stage 2 joins the corpus ONCE against the
    * queries×nCandidates-row candidate list — broadcast on the
    * candidate side, so the refine is a narrow broadcast-hash probe of
    * the corpus scan, zero shuffles of data. The per-query re-rank
    * window partitions on query_id over ≤ nCandidates rows per query.
    * Output: (query_id, data_id, cos_sim, rank), rank 1..k by
    * (cos_sim desc, data_id) — exact integer dots + one IEEE division,
    * so the DuckDB oracle replays it cell-exact. */
  def ivfPqRefineTopK(embeddings: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, k: Int, nCandidates: Int,
      nLists: Int = 8, nProbe: Int = 2, cellIters: Int = 3,
      nSub: Int = 4, nCentroids: Int = 8, pqIters: Int = 2,
      trainCap: Int = 10000): DataFrame = {
    require(nCandidates >= k,
      s"nCandidates ($nCandidates) must be >= k ($k) — the refine can only reorder")
    val cands = ivfPqTopK(embeddings, idCol, embCol, queries, queryIdCol,
      nCandidates, nLists, nProbe, cellIters, nSub, nCentroids, pqIters,
      trainCap)
      .select(col("query_id"), col("data_id"))
    val qs = broadcast(queries
      .select(col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id"), col("_qe"), norm(col("_qe")).as("_qn")))
    val exact = embeddings
      .select(col(idCol).as("data_id"), quantize(col(embCol)).as("_e"))
      .join(broadcast(cands), "data_id")
      .join(qs, "query_id")
      .select(col("query_id"), col("data_id"),
        (dot(col("_e"), col("_qe")) / (norm(col("_e")) * col("_qn")))
          .as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("data_id"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): cluster the
    * embedding space with [[ivfTopKPortable]]'s deterministic integer
    * k-means cells, then inside each cell mark every vector that has a
    * smaller-id neighbour with cosine ≥ `minCosine` as a semantic
    * duplicate of its SMALLEST such neighbour. Returns one row per
    * vector: (vec_id, cell, dup_of nullable, keep).
    *
    * POLICY — non-transitive min-id, NOT a greedy keep-set: a vector
    * drops when ANY smaller-id in-cell neighbour is within the cosine
    * ball, whether or not that neighbour itself survives. In a chain
    * a~b, b~c with cos(a,c) < `minCosine`, c is dropped although no
    * KEPT vector is within its ball, and c's `dup_of` (= b) is itself
    * a dropped row — follow `dup_of` transitively to reach the kept
    * representative. This is the single-pass decision the SemDeDup
    * recipe applies (one scan over pairs, no iteration); a greedy
    * keep-set would need a sequential pass per cell. The oracle and
    * the property tests encode exactly this policy. Zero-norm
    * QUANTIZED vectors (every |element| < 0.0005 rounds to 0) are
    * excluded from pair formation on both sides — their cosine is
    * 0/0 — so they always KEEP with null dup_of, identically in both
    * engines, rather than riding engine-specific NaN/NULL division.
    *
    * A curation pipeline applies this before training (near-dup text
    * never shares tokens with a paraphrase; embedding-cosine d08
    * catches lexical overlap — THIS op catches meaning-level
    * duplication across the whole corpus through the cluster
    * structure, at cells² ≪ n² cost).
    *
    * Scale shape: the cluster assignment is the IVF narrow projection
    * (zero data-side shuffles against driver-literal centroids); pair
    * formation is confined WITHIN cells — one self-join on the cell key
    * — so candidate volume is Σ|cell|², controlled by nLists (at a
    * fixed nLists a growing corpus crosses a quadratic regime — use
    * [[semDedupAutoSized]], which sizes nLists = ceil(√n), the
    * assignment/pair cost balance point; see [[autoLists]]).
    * `maxCellSize` excludes degenerate cells from pair formation
    * entirely (their members all KEEP, audited via the `cell_capped`
    * column, never silently half-deduped) — the same cap+audit contract
    * as the LSH family, and the cap is encoded in the oracle. */
  def semDedup(embeddings: DataFrame, idCol: String, embCol: String,
      minCosine: Double, nLists: Int = 8, iters: Int = 3,
      trainCap: Int = 10000, maxCellSize: Int = 10000): DataFrame = {
    val data = embeddings.select(
      col(idCol).as("vec_id"), quantize(col(embCol)).as("_e"))
    val centroids = trainPortableCentroids(data, "vec_id", nLists, iters, trainCap)
    // eager localCheckpoint: the assignment feeds FOUR consumers (cell
    // sizes, both self-join sides, the final left join) — without it
    // each reference re-scans the table and re-computes the nLists
    // 64-dim distance dots (plan-audited: 6 scans at sf0.1). One scan,
    // one materialization of (id, quantized vec, norm, cell); the g01
    // managed-lifetime rule
    val assigned = data
      .select(col("vec_id"), col("_e"), norm(col("_e")).as("_n"),
        array_min(centroidDistStructs(centroids, col("_e")))
          .getField("list").as("cell"))
      .localCheckpoint(true)
    val cellOk = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("_cn"))
      .select(col("cell"), (col("_cn") <= maxCellSize).as("_ok"))
    val inPlay = assigned.join(cellOk, Seq("cell"))
    val a = inPlay.where(col("_ok"))
      .select(col("cell"), col("vec_id").as("_ida"), col("_e").as("_ea"),
        col("_n").as("_na"))
    val b = inPlay.where(col("_ok"))
      .select(col("cell"), col("vec_id").as("_idb"), col("_e").as("_eb"),
        col("_n").as("_nb"))
    // the zero-norm guard runs BEFORE the cosine: 0/0 is NaN in Spark
    // but NULL-or-inf depending on DuckDB's ieee setting — pin the
    // semantics (always keep) instead of riding engine defaults
    val dupOf = a.join(b, Seq("cell"))
      .where(col("_ida") < col("_idb") &&
        col("_na") > 0 && col("_nb") > 0 &&
        dot(col("_ea"), col("_eb")) / (col("_na") * col("_nb")) >= minCosine)
      .groupBy(col("_idb"))
      .agg(min(col("_ida")).as("dup_of"))
    inPlay
      .join(dupOf, col("vec_id") === col("_idb"), "left")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("dup_of"), col("dup_of").isNull.as("keep"),
        not(col("_ok")).as("cell_capped"))
  }

  /** [[semDedup]] with `nLists` derived from the corpus cardinality —
    * the 100 TB form, and the d44 lesson applied to the OTHER fixed
    * dial: at nLists = 8 a 500 k-vector corpus puts ~62 k vectors in
    * every cell, every cell trips `maxCellSize`, and the dedup decision
    * disengages entirely (ALL rows keep, `cell_capped = true` — audited
    * but useless). The one driver action is an exact count() (the d10
    * trainCap class of bounded probe); pass `nRows` to skip it when the
    * caller already knows the cardinality. */
  def semDedupAutoSized(embeddings: DataFrame, idCol: String, embCol: String,
      minCosine: Double, iters: Int = 3,
      trainCap: Int = 10000, maxCellSize: Int = 10000,
      nRows: Option[Long] = None): DataFrame = {
    val n = nRows.getOrElse(embeddings.count())
    semDedup(embeddings, idCol, embCol, minCosine,
      autoLists(n), iters, trainCap, maxCellSize)
  }

  /** ceil(√n) clamped to [8, 1024] — the cost-BALANCED cell count, not
    * an arbitrary target size. The op has two data-side stages whose
    * costs pull in opposite directions: cluster assignment is
    * n · L · d (every row scores every centroid) and within-cell pair
    * formation is n · (n/L) · d (every row meets its cellmates), so a
    * fixed cell SIZE leaves assignment quadratic in n and a fixed cell
    * COUNT leaves pairs quadratic; L* = √n equalizes them and the total
    * is 2 · n^1.5 · d — the floor for this exhaustive-within-cell
    * family (measured at the 100× corpus: 143 s at the n/2000 sizing →
    * balanced sizing cuts pair volume 4.4×). The 8 floor keeps tiny
    * corpora from degenerating to one cell; the 1024 clamp bounds the
    * driver-side k-means and the centroid literal the distance
    * projection carries (past it, cells grow beyond √n and the
    * maxCellSize audit takes over — at d=64 that is a ≥1M-vector
    * corpus per... 1024² = 1M: shard the corpus or raise the clamp
    * deliberately).
    *
    * Portability: IEEE-754 requires sqrt to be CORRECTLY ROUNDED (a
    * hardware instruction on every platform — unlike log/exp, which
    * are only faithfully rounded and genuinely diverge across libm
    * implementations, the reason d44's autoPlanes uses integer bit
    * length). n ≤ 2^53 is exact as a double, so
    * `CEIL(SQRT(CAST(n AS DOUBLE)))` in DuckDB and
    * `math.ceil(math.sqrt(n.toDouble))` here are bit-identical for any
    * real corpus size, and the oracle re-derives the dial from the
    * same COUNT(*). */
  def autoLists(n: Long): Int = {
    require(n >= 0 && n <= (1L << 53), s"n out of exact-double range: $n")
    val raw = math.ceil(math.sqrt(n.toDouble)).toLong
    math.max(8L, math.min(1024L, raw)).toInt
  }

  /** LSH-bucketed ANN: shuffle both sides once on the (table, bucket)
    * key, rank candidates by exact cosine. Recall < 1 by design; the
    * recall/cost dial is (nPlanes, nTables, multiProbeBits) exactly as in
    * [[embeddingNearDups]] — probing fans out the QUERY side only (the
    * small side), the data side stays one row per (vector, table).
    * `maxBucketSize` drops degenerate data buckets before the join. */
  def lshBucketed(embeddings: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, k: Int, nPlanes: Int = 12,
      nTables: Int = 4, multiProbeBits: Int = 1,
      maxBucketSize: Int = 10000): DataFrame = {
    val dim = embeddingDim(embeddings, embCol)
    val data = capTableBuckets(
      tableBucketed(embeddings, idCol, embCol, nTables, nPlanes, dim), maxBucketSize)
      .withColumnRenamed("_id", "data_id")
    val qs = queries
      .select(col(queryIdCol).as("query_id"), quantize(col(embCol)).as("_qe"))
      .select(col("query_id"), col("_qe"), norm(col("_qe")).as("_qn"),
        posexplode(srpTableCodes(col("_qe"), nTables, nPlanes, dim)))
      .withColumnRenamed("pos", "_tbl")
      .select(col("query_id"), col("_qe"), col("_qn"), col("_tbl"),
        explode(probeBuckets(col("col"), nPlanes, multiProbeBits)).as("_bucket"))
    val scored = data.join(qs, Seq("_tbl", "_bucket"))
      .where(col("data_id") =!= col("query_id"))
      .select(col("query_id"), col("data_id"),
        (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("cos_sim"))
      // a (query, data) pair can collide in several tables/probes — one
      // candidate row each before ranking
      .dropDuplicates("query_id", "data_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("data_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Exact d×d covariance (and raw second-moment) matrix of an embedding
    * column — the whitening/PCA precursor to ANN indexing (d37's
    * per-dimension stats are this matrix's diagonal; the off-diagonals
    * are what whitening needs). One pass, no self-join: each row emits
    * its d² quantized products via a nested-transform outer product,
    * and a (i, j)-keyed hash-aggregate reduces them map-side — the
    * shuffle carries at most d² cells per partition regardless of row
    * count, so the plan survives any corpus size (the d² amplification
    * is inside one narrow stage, collapsed before the exchange).
    * Margins Σqᵢ ride the SAME aggregate as the products (for a fixed
    * cell (i, j), Σrows x IS the i-margin) — one scan, one exchange.
    *
    * Null elements: a cell whose i-th OR j-th element is null is
    * excluded from that cell's n and all three sums together (filter
    * on the product, which is null iff either side is), so n always
    * counts exactly the rows the sums saw and cov stays unbiased —
    * counting the row while the sums skip it would deflate cov
    * silently. Rows with all-null or short arrays contribute nothing.
    *
    * Exactness: values quantize to integer millis (the d37/quantize
    * rule: cast FLOAT→DOUBLE before ×1000, half-up identical on both
    * engines), all sums are exact longs, and `cov` is formed as IEEE
    * ops over double-cast exact longs — (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ)/n² — the
    * q58 overflow pattern: the long products would wrap at ~10⁷ rows,
    * the double forms stay exact below 2⁵³ and ≤1-ulp beyond,
    * identically on both engines. `dims` truncates to the first d
    * dimensions (bounds the d² blow-up; pass the full width for the
    * whole matrix). */
  def covarianceMatrix(embeddings: DataFrame, embCol: String,
      dims: Int): DataFrame =
    covarianceCells(embeddings, embCol, dims)
      .select(col("i"), col("j"), col("n"), col("sprod"),
        ((col("n").cast("double") * col("sprod").cast("double")
          - col("_si").cast("double") * col("_sj").cast("double"))
          / (col("n").cast("double") * col("n").cast("double"))).as("cov"))

  /** The (i, j)-cell aggregate behind [[covarianceMatrix]] and
    * [[pcaPowerProjection]]: exact long (n, Σqᵢqⱼ, Σqᵢ, Σqⱼ) per cell
    * from ONE scan and ONE ≤d²-cell exchange. */
  private def covarianceCells(embeddings: DataFrame, embCol: String,
      dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 4096, s"dims must be in [1,4096], got $dims")
    val qArr = s"transform(CAST(slice($embCol, 1, $dims) AS ARRAY<DOUBLE>), " +
      "x -> CAST(round(x * 1000) AS BIGINT))"
    // the margins Σqᵢ/Σqⱼ ride the SAME aggregate as the products (for
    // a fixed cell (i, j), Σrows x IS the i-margin) — one scan, one
    // exchange, no separate margin branch to re-read the table
    embeddings
      .select(expr(qArr).as("_q"))
      .select(explode(expr(
        """flatten(transform(_q, (x, i) -> transform(_q, (y, j) ->
          |  named_struct('i', i, 'j', j, 'p', x * y, 'x', x, 'y', y))))""".stripMargin)).as("e"))
      .select(col("e.i").cast("long").as("i"), col("e.j").cast("long").as("j"),
        col("e.p").as("p"), col("e.x").as("x"), col("e.y").as("y"))
      // p is null iff either element is — one filter keeps n and the
      // three sums consistent (see scaladoc null contract)
      .where(col("p").isNotNull)
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sprod"),
        sum(col("x")).as("_si"), sum(col("y")).as("_sj"))
  }

  /** Top principal component by ALL-INTEGER power iteration, applied as
    * a per-vector projection — the PCA/whitening step SemDeDup-style
    * pipelines run before clustering, with every arithmetic step exact
    * so a second engine reproduces it bit for bit:
    *
    *   1. covariance cells (one scan, one ≤d² exchange — [[covarianceCells]]);
    *   2. unnormalized covariance C'ᵢⱼ = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ as exact
    *      longs (overflow budget: |C'| < 2⁶³ needs n·Σ|qᵢqⱼ| below
    *      9.2·10¹⁸ — milli-quantized unit-scale embeddings keep that
    *      safe past 10⁹ rows, the q97 budget rule);
    *   3. rescale by ceil(max|C'|/1000) (floor division — never a
    *      float), then `iters` rounds of u = C''v with v re-quantized
    *      to ≤~1000 by floor division each round: the whole recurrence
    *      is integer, so there is no normalization sqrt to drift;
    *   4. project every vector onto the resulting direction:
    *      pc1_proj = Σ qᵢvᵢ, an exact long.
    *
    * The matrix work runs on the DRIVER over the collected d² cells —
    * bounded by DIMENSION, not data (64-dim → 4 096 rows ≈ the IVF
    * centroid-literal contract), and the per-row projection is a NARROW
    * codegen dot against the component literal: zero extra shuffles on
    * the data side. Covariance is PSD so the dominant eigenvalue is
    * non-negative and the iteration cannot sign-flip between rounds;
    * ties/degenerate zero matrices resolve deterministically (divisors
    * clamp at 1, a zero iterate stays zero). Null embedding elements
    * follow [[covarianceMatrix]]'s per-cell exclusion contract in the
    * covariance pass; in the projection pass a null element contributes
    * 0 (the graft_dot skip-null contract, matched by the oracle's SUM
    * which also skips nulls) — the row's projection is the PARTIAL sum
    * over its non-null elements, never null. */
  def pcaPowerProjection(embeddings: DataFrame, idCol: String, embCol: String,
      dims: Int, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16], got $iters")
    val cells = covarianceCells(embeddings, embCol, dims)
      .select(col("i"), col("j"), col("n"), col("sprod"), col("_si"), col("_sj"))
      .collect()
    val cp = Array.ofDim[Long](dims, dims)
    cells.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      cp(i)(j) = r.getLong(2) * r.getLong(3) - r.getLong(4) * r.getLong(5)
    }
    def ceilDiv1000(x: Long): Long = math.max((x + 999L) / 1000L, 1L)
    val d1 = ceilDiv1000(cp.map(_.map(math.abs).max).max)
    val cs = cp.map(_.map(Math.floorDiv(_, d1)))
    var v = Array.fill(dims)(1000L)
    for (_ <- 0 until iters) {
      val u = Array.tabulate(dims) { i =>
        var s = 0L; var j = 0
        while (j < dims) { s += cs(i)(j) * v(j); j += 1 }
        s
      }
      val d2 = ceilDiv1000(u.map(math.abs).max)
      v = u.map(Math.floorDiv(_, d2))
    }
    embeddings
      .select(col(idCol).as("vec_id"),
        quantize(slice(col(embCol), 1, dims)).as("_e"))
      .select(col("vec_id"),
        dot(col("_e"), array(v.toSeq.map(x => lit(x.toDouble)): _*))
          .cast("long").as("pc1_proj"))
  }

  /** Scalar-quantization (int8) ANN: corpus-calibrated per-dimension
    * symmetric quantization to [−127, 127], integer-code dot-product
    * scan for the top-`candidates`, exact cosine rescore of those for
    * the top-`k` — the third point of the compression-ANN triangle
    * (d10 IVF prunes CELLS, d55 PQ compresses via CODEBOOKS, THIS
    * compresses each dimension independently — the simplest form, no
    * trained model at all, and the one vector stores ship as
    * "int8/SQ8"). Per-dim scale = max |value| over the corpus (floor 1
    * so an all-zero dimension divides by 1, not 0); code =
    * sign(x) · floor((|x|·127) / scale) — floor of an IEEE division of
    * exact integers ≪ 2⁵³, which is EXACTLY integer floor division on
    * both engines (the quotient can't sit within an ulp of an integer
    * unless it IS one — |a − k·s| ≥ 1 for a ≠ k·s), and sign-split so
    * floor-vs-trunc divergence on negatives never arises. Code dots
    * are exact sums of |q|≤127² terms — hash-portable.
    *
    * Scale shape: the calibration pass is one posexplode + a
    * dim-keyed max (map-side combined, dim rows out) assembled into a
    * one-row array and BROADCAST back (the mixtureWeights pattern —
    * never a driver literal, never a shuffle of the data side); the
    * scan computes the int8 codes per row (at rest a production store
    * would persist them — this op IS the write-path transform) and
    * the top-`candidates` rides TakeOrderedAndProject carrying the
    * quantized vector only for those rows; the exact rescore touches
    * `candidates` rows, one IEEE division each (the d06 contract).
    * `query` must be a ONE-ROW DataFrame (the bruteForceTopK
    * contract): the output carries no query id, and the single global
    * top-`candidates` would interleave multiple queries' scores into
    * one meaningless ranking — for a query SET, loop per query or use
    * the bucketed family (lshBucketed shuffles both sides once).
    * A zero query vector has no direction: every cosine is NaN and
    * the top-k is the id-order tie-break — filter upstream.
    * Returns (vec_id, q_score: long, cos_sim) — top-k by
    * (cos_sim desc, vec_id). */
  def sqTopK(embeddings: DataFrame, idCol: String, embCol: String,
      query: DataFrame, queryIdCol: String,
      candidates: Int = 50, k: Int = 10): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val data = embeddings.select(
      col(idCol).as("vec_id"), quantize(col(embCol)).as("_e"))
    // eager localCheckpoint: the one-row scales frame feeds BOTH
    // crossJoin consumers (query codes + data codes) — without it each
    // re-runs the full-corpus calibration scan (plan-audited: 2 scans);
    // the checkpoint is one row holding a dim-length array (the
    // mixtureWeights bounded-frame class)
    // limit(1) on the one-row checkpoint is a semantic no-op that
    // re-marks it BOUNDED: a checkpoint is a stats-less LogicalRDD the
    // UnboundedCrossJoinGuard cannot see inside, and an explicit Limit
    // is that guard's documented "provably small" class — without it
    // the two condition-free crossJoins below trip the engine guard
    val scales = data
      .select(posexplode(col("_e")).as(Seq("_d", "_x")))
      .groupBy(col("_d")).agg(greatest(max(abs(col("_x"))), lit(1.0)).as("_m"))
      .agg(sort_array(collect_list(struct(col("_d"), col("_m")))).as("_sm"))
      .select(transform(col("_sm"), s => s.getField("_m")).as("_sc"))
      .localCheckpoint(true)
      .limit(1)
    def codes(e: Column): Column = zip_with(e, col("_sc"), (x, m) =>
      when(x < 0, -floor(((-x) * 127) / m)).otherwise(floor((x * 127) / m))
        .cast("double"))
    val q = broadcast(query
      .select(col(queryIdCol).as("_qid"), quantize(col(embCol)).as("_qe"))
      .crossJoin(broadcast(scales))
      .select(col("_qid"), col("_qe"), norm(col("_qe")).as("_qn"),
        codes(col("_qe")).as("_qc")))
    val scored = data
      .crossJoin(broadcast(scales))
      .select(col("vec_id"), col("_e"), codes(col("_e")).as("_c"))
      .crossJoin(q)
      .where(col("vec_id") =!= col("_qid"))
      .select(col("vec_id"), col("_e"), col("_qe"), col("_qn"),
        dot(col("_c"), col("_qc")).cast("long").as("q_score"))
      .orderBy(col("q_score").desc, col("vec_id"))
      .limit(candidates)
    scored
      .select(col("vec_id"), col("q_score"),
        (dot(col("_e"), col("_qe")) / (norm(col("_e")) * col("_qn")))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Cluster-balanced corpus sample: assign every vector to its
    * deterministic k-means cell (the d10/d48 portable quantizer) and
    * keep at most `perCell` per cell by content-keyed rank — the
    * semantic-diversity draw of training-data curation (a uniform
    * sample over-represents the corpus's dense modes; capping per
    * SEMANTIC cluster flattens topical skew the way d14's per-key cap
    * flattens per-source skew). Rank within a cell is
    * (md5-uniform(vec_id), vec_id) — no RNG state, the d12/d18 rule,
    * so the draw is stable across runs/engines and GROWS stably (new
    * corpus rows displace old picks only within their own cell).
    *
    * Scale shape: assignment is one narrow projection against the
    * driver-literal centroids (zero shuffle); the cap is ONE cell-keyed
    * exchange whose per-key volume the map-side WindowGroupLimit bounds
    * to perCell rows before the shuffle (the d14 plan property, pinned)
    * — a hot cell ships perCell rows per map task, never its full
    * population. Returns (vec_id, cell) for the kept rows. */
  def clusterBalancedSample(embeddings: DataFrame, idCol: String,
      embCol: String, perCell: Int, nLists: Int = 8, iters: Int = 3,
      trainCap: Int = 10000): DataFrame = {
    require(perCell >= 1, s"perCell must be >= 1, got $perCell")
    val data = embeddings.select(
      col(idCol).as("vec_id"), quantize(col(embCol)).as("_e"))
    val centroids = trainPortableCentroids(data, "vec_id", nLists, iters, trainCap)
    val assigned = data.select(col("vec_id"),
      array_min(centroidDistStructs(centroids, col("_e")))
        .getField("list").cast("long").as("cell"))
    Sampling.capPerKey(assigned, "cell", "vec_id", "vec_id", perCell)
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998)
    * at λ = 1/2: from the exact cosine top-`nCandidates` of one query
    * vector, greedily select `k` results maximizing
    * 2·MMR = rel(c) − max_{s ∈ selected} sim(c, s) — the
    * diversity-aware selection step of retrieval/exemplar curation
    * (near-identical top hits waste a few-shot budget; MMR trades
    * relevance against redundancy). λ is fixed at 1/2 so the score is
    * ONE subtraction of two IEEE quotients of exact quantized longs —
    * no float λ-blend to diverge — and the first pick (empty selected
    * set, penalty 0) is pure relevance, the published base case.
    *
    * `query` must hold EXACTLY ONE row (the bruteForceTopK contract):
    * a multi-row frame would cross-join every candidate against every
    * query row and corrupt the greedy pool with duplicate vec_ids —
    * guarded at runtime (the frame is tiny by contract, so the check
    * costs one 2-row scan).
    *
    * Scale shape: the production rerank shape — candidate formation is
    * the corpus-wide stage (one scan, TakeOrderedAndProject top-n, the
    * d06 plan) and everything after operates on the ≤ nCandidates-row
    * pool, localCheckpointed ONCE so the n²-pair frame and the k
    * greedy rounds reread 20 rows, never the corpus. The greedy loop
    * is inherently sequential (each pick changes the penalty of the
    * rest); k bounds it by CONTRACT, and each round is a bounded
    * anti-join + max-agg + top-1 — driver-side orchestration, executor
    * data. Ties break by vec_id everywhere (total order, the d06
    * rule). Returns (sel_rank 1..k, vec_id, cos_sim, mmr2x) with
    * output rounding 6 (the ball_est/xent convention). */
  def mmrRerank(embeddings: DataFrame, idCol: String, embCol: String,
      query: DataFrame, queryIdCol: String,
      nCandidates: Int = 20, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nCandidates >= k,
      s"nCandidates ($nCandidates) must be >= k ($k)")
    require(query.limit(2).count() == 1,
      "mmrRerank requires a single-row query frame (one query vector)")
    val q = broadcast(query
      .select(col(queryIdCol).as("_qid"), quantize(col(embCol)).as("_qe"))
      .select(col("_qid"), col("_qe"), norm(col("_qe")).as("_qn")))
    val cand = embeddings
      .select(col(idCol).as("vec_id"), quantize(col(embCol)).as("_e"))
      .select(col("vec_id"), col("_e"), norm(col("_e")).as("_n"))
      .crossJoin(q)
      .where(col("vec_id") =!= col("_qid"))
      .select(col("vec_id"), col("_e"), col("_n"),
        (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(nCandidates)
      .localCheckpoint(true)
    val pairs = cand
      .select(col("vec_id").as("_ca"), col("_e").as("_ea"), col("_n").as("_na"))
      .join(broadcast(cand.select(col("vec_id").as("_cb"),
        col("_e").as("_eb"), col("_n").as("_nb"))), col("_ca") =!= col("_cb"))
      .select(col("_ca"), col("_cb"),
        (dot(col("_ea"), col("_eb")) / (col("_na") * col("_nb"))).as("_sim"))
      .localCheckpoint(true)
    var sel = cand
      .orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(lit(1).as("sel_rank"), col("vec_id"), col("rel"),
        col("rel").as("mmr2x"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val pen = pairs
        .join(sel.select(col("vec_id").as("_cb")), Seq("_cb"))
        .groupBy(col("_ca")).agg(max(col("_sim")).as("_pen"))
      val pick = cand
        .join(sel.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .join(pen, col("vec_id") === col("_ca"), "left")
        .select(col("vec_id"), col("rel"),
          (col("rel") - coalesce(col("_pen"), lit(0.0))).as("mmr2x"))
        .orderBy(col("mmr2x").desc, col("vec_id")).limit(1)
        .select(lit(i).as("sel_rank"), col("vec_id"), col("rel"),
          col("mmr2x"))
      sel = sel.unionByName(pick).localCheckpoint(true)
    }
    sel.select(col("sel_rank"), col("vec_id"),
      round(col("rel"), 6).as("cos_sim"), round(col("mmr2x"), 6).as("mmr2x"))
  }

  /** Hard-negative mining for contrastive-embedding training (the
    * in-batch-negatives upgrade of DPR/SimCSE-style recipes, Karpukhin
    * et al. EMNLP'20 §4.2): for each of the first `nQueries` vectors
    * (by id — deterministic, no RNG), the `k` MOST cosine-similar
    * vectors carrying a DIFFERENT label — the near-misses a contrastive
    * loss learns the most from (random negatives are trivially far;
    * same-label neighbours are positives, not negatives).
    *
    * Scale shape: the query set is contract-bounded (≤ 64 rows) and
    * broadcast with quantized vectors + norms precomputed, so the
    * corpus is read ONCE and each row scores against every query
    * map-side (a BroadcastNestedLoopJoin by construction — there is no
    * equi-key; the label inequality filters in the same stage). The
    * per-query top-k plans as a rank window that Spark 4 rewrites to
    * WindowGroupLimit: each map task keeps only its local top-k per
    * query BEFORE the exchange, so the shuffle carries ≤ tasks×q×k
    * rows, never the corpus (spec-pinned). Swap the scoring leg for
    * ivfPqTopK per query at extreme corpus scale — the (q_id, vec_id,
    * cos_sim) contract is identical. Exact quantized-long dot products
    * (the d06 arithmetic): cos_sim is one IEEE division, bit-identical
    * in DuckDB, so the mined set is oracle-checked hash-exact. Ties
    * break (cos_sim desc, vec_id) — total order. */
  def hardNegatives(embeddings: DataFrame, idCol: String, embCol: String,
      labelCol: String, nQueries: Int = 5, k: Int = 5): DataFrame = {
    require(nQueries >= 1 && nQueries <= 64,
      s"nQueries must be in [1, 64], got $nQueries")
    require(k >= 1, s"k must be >= 1, got $k")
    val base = embeddings
      .select(col(idCol), quantize(col(embCol)).as("_e"),
        col(labelCol).cast("long").as("_lbl"))
      .select(col(idCol), col("_e"), col("_lbl"), norm(col("_e")).as("_n"))
    val qs = broadcast(base
      .orderBy(col(idCol)).limit(nQueries)
      .select(col(idCol).as("q_id"), col("_e").as("_qe"),
        col("_lbl").as("_qlbl"), col("_n").as("_qn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col(idCol))
    base
      .join(qs, col("_lbl") =!= col("_qlbl") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("vec_id"), col("_lbl").as("neg_label"),
        (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Johnson–Lindenstrauss random projection to `rDim` dimensions via
    * the deterministic Rademacher ±1 plane matrix ([[planeMatrix]] —
    * the Achlioptas 2003 database-friendly JL variant; SRP d07 is its
    * 1-BIT truncation): out_j = ⟨quantize(e), plane_j⟩ — a dot of
    * exact longs with ±1 literals, so every output coordinate is an
    * EXACT integer and the oracle replays the matrix from the md5
    * parity. The dimensionality-reduction preprocessing step in front
    * of clustering/ANN at scale (distances distort by ≤ ε w.h.p. at
    * rDim = O(ln n/ε²), and downstream pair work drops dim/rDim-fold).
    *
    * Scale shape: a pure narrow projection — the plane matrix ships as
    * a literal (computed ONCE on the driver, the planeMatrix rule), no
    * shuffle, no state; partitioning passes through untouched. */
  def jlProject(embeddings: DataFrame, idCol: String, embCol: String,
      rDim: Int): DataFrame = {
    require(rDim >= 1 && rDim <= 64, s"rDim must be in [1, 64], got $rDim")
    val dim = embeddingDim(embeddings, embCol)
    val planes = planeMatrix(rDim, dim)
    val e = quantize(col(embCol))
    val outs = planes.zipWithIndex.map { case (row, j) =>
      (0 until dim).map(d =>
          element_at(e, d + 1) * lit(row(d)))
        .reduce(_ + _).cast("long").as(s"p$j")
    }
    embeddings.select(col(idCol) +: outs: _*)
  }

  /** kNN LABEL PROBE — the standard embedding-quality evaluation
    * (does the space cluster by label?): for each of the first
    * `nQueries` vectors by id, predict its label as the MAJORITY label
    * of its `k` nearest other vectors (ties: higher vote count, then
    * smaller label — a total order), and report per query the true
    * label, the prediction, and the winning vote count. The confusion
    * this table folds into is the go/no-go gate before trusting the
    * embedding column for SemDeDup/clustering decisions.
    *
    * Scale shape: [[hardNegatives]]' scan — queries broadcast, corpus
    * read once, per-query top-k as WindowGroupLimit (map-side rank
    * pushdown) — then a ≤ nQueries·k-row vote aggregate. The argmax is
    * the min-struct fold (no second window). */
  def knnLabelProbe(embeddings: DataFrame, idCol: String, embCol: String,
      labelCol: String, nQueries: Int = 20, k: Int = 5): DataFrame = {
    require(nQueries >= 1 && nQueries <= 64,
      s"nQueries must be in [1, 64], got $nQueries")
    require(k >= 1, s"k must be >= 1, got $k")
    val base = embeddings
      .select(col(idCol), quantize(col(embCol)).as("_e"),
        col(labelCol).cast("long").as("_lbl"))
      .select(col(idCol), col("_e"), col("_lbl"), norm(col("_e")).as("_n"))
    val qs = broadcast(base
      .orderBy(col(idCol)).limit(nQueries)
      .select(col(idCol).as("q_id"), col("_e").as("_qe"),
        col("_lbl").as("true_label"), col("_n").as("_qn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("_nid"))
    val neighbours = base
      .join(qs, col(idCol) =!= col("q_id"))
      .select(col("q_id"), col("true_label"), col(idCol).as("_nid"),
        col("_lbl").as("_nlbl"),
        (dot(col("_e"), col("_qe")) / (col("_n") * col("_qn"))).as("cos_sim"))
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
    neighbours
      .groupBy(col("q_id"), col("true_label"), col("_nlbl"))
      .agg(count(lit(1)).as("_votes"))
      .groupBy(col("q_id"), col("true_label"))
      .agg(min(struct((-col("_votes")).as("_nv"), col("_nlbl").as("_l")))
        .as("_m"))
      .select(col("q_id"), col("true_label"),
        col("_m._l").as("predicted_label"), (-col("_m._nv")).as("votes"))
  }
}
