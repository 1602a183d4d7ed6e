package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data curation.
  *
  * Every decision is a pure function of row CONTENT, not of RNG state:
  * u(key) = (md5_upper(key) >>> 11) / 2^53, a uniform double in [0, 1)
  * built from the same little-endian md5 half as the dedup hash chain
  * (graft.functions.Md5Mix). Consequences that matter at 100 TB:
  *   - re-running the sample yields byte-identical output (no seed
  *     plumbing, no partition-order sensitivity — unlike df.sample,
  *     whose draw depends on row order within partitions);
  *   - appending new data never flips the verdict on existing rows, so
  *     incremental pipelines can sample shards independently;
  *   - identical texts sample identically — consistent with dedup;
  *   - the exact sample is reproducible in DuckDB SQL
  *     ((md5_number_upper(key) >> 11) / 9007199254740992.0), so sampling
  *     operators are hash-exact oracle-checkable.
  *
  * The division is by a power of two and the mantissa fits in 53 bits,
  * so u is FP-exact on both engines — a `u < rate` cut is deterministic.
  */
object Sampling {

  /** Uniform [0,1) derived from a column's content. The key is cast to
    * string INSIDE (md5Upper strictly requires StringType): string keys
    * hash unchanged (string→string cast is identity), numeric keys hash
    * as their decimal rendering — the same bytes DuckDB's
    * CAST(x AS VARCHAR) feeds md5_number_upper, so every caller gets
    * oracle-identical draws without remembering the cast (assignSplit's
    * long-key contract, made uniform). A NULL key yields a NULL u —
    * callers decide whether null rows are observations. */
  def hashUniform(key: Column): Column =
    call_function("shiftrightunsigned",
      graft.functions.TextHashExpressions.md5Upper(key.cast("string")), lit(11))
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Content-keyed Bernoulli sample: keep rows with u(key) < rate. */
  def uniformSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.where(hashUniform(col(keyCol)) < lit(rate))

  /** Per-stratum rates — the balancing pass of a corpus pipeline (e.g.
    * downsample the dominant language while keeping the tail): rows in a
    * stratum missing from `rates` sample at `defaultRate`. Narrow (no
    * shuffle): the rate is a when-chain over the stratum column. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.where(hashUniform(col(keyCol)) < rate)
  }

  /** Deterministic global shuffle + shard for training-data export: the
    * "shuffle the corpus, split into N files" step every pretraining run
    * needs, without RNG. Each row's shard is floor(u(key)·n) — a pure
    * function of content, so re-runs and engine re-implementations
    * produce the identical layout — and its position within the shard is
    * the rank by (u, id), a total order (idCol must be unique; u alone
    * ties for byte-identical texts).
    *
    * Scale shape: one hash-partition exchange on `shard` (n ≈ target
    * file count) + an in-shard sort — exactly the shuffle a
    * repartition(n).sortWithinPartitions export would cost, but with a
    * deterministic, resumable assignment instead of round-robin. The
    * caveat of [[Packing.packByOffset]] applies: byte-identical
    * duplicates share u and therefore a shard — dedup first. */
  def shuffleShard(df: DataFrame, idCol: String, keyCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val u = hashUniform(col(keyCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("_u"), col(idCol))
    df.withColumn("_u", u)
      .withColumn("shard", floor(col("_u") * nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_u")
  }

  /** Deterministic cap of n rows per key — the scalable "reservoir":
    * rank rows within each key by (u(sortKey), id) and keep the first n.
    * One shuffle on the key; no RNG; stable under re-runs and across
    * engines. `idCol` must be unique per row — it is what keeps the
    * order total when two rows share identical sortKey content (u and
    * sortKey alone would tie, and row_number over a tie is
    * partition-order-dependent).
    *
    * Skew note: the row_number ≤ n filter plans as WindowGroupLimit on
    * BOTH sides of the exchange (verified in the d14 physical plan), so
    * each map task ships at most n rows per key — a dominant key costs
    * n·partitions shuffled rows, not its full population. The
    * stratum-sized-single-task ceiling that bites naive per-key windows
    * does not apply here. */
  def capPerKey(df: DataFrame, keyCol: String, sortKeyCol: String,
      idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashUniform(col(sortKeyCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= n)
      .drop("_rk")
  }

  /** Deterministic weighted sampling WITHOUT replacement, probability
    * proportional to an integer weight — the quality/importance-weighted
    * corpus draw (sample high-quality documents more often) made
    * engine-portable. This is Efraimidis–Spirakis A-ES with the
    * float-free key: instead of u^(1/w) (whose pow/ln is
    * engine-specific), each row's priority is the MAX of `w` independent
    * content-keyed draws — identically distributed (P(max of w uniforms
    * ≤ t) = t^w), but every draw is an exact 53-bit integer
    * (md5(id:i) >>> 11), so priorities, and therefore the top-k sample,
    * are bit-identical on any engine. Cost is one NARROW projection
    * (sequence + transform + array_max inside codegen — no explode, no
    * join) and a TakeOrdered: no shuffle of the corpus at all.
    *
    * Weights are clamped to [0, `maxWeight`] (draw count is work — the
    * cap is the contract, loud in the signature, not silent); w = 0 or
    * NULL means "never sampled" and the row is filtered out. `idCol`
    * must be unique (it keys the draws; duplicate ids would draw
    * identical priorities — dedup first, as with every content-keyed
    * op here). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      maxWeight: Int = 64): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(maxWeight >= 1 && maxWeight <= 256,
      s"maxWeight must be in [1,256], got $maxWeight")
    // coalesce BEFORE least: Spark's least() SKIPS null arguments, so
    // least(NULL, cap) would be the cap — giving a null-weight row the
    // maximum draw count instead of excluding it
    val w = least(coalesce(weight.cast("long"), lit(0L)), lit(maxWeight.toLong))
    val draw = (i: Column) => call_function("shiftrightunsigned",
      graft.functions.TextHashExpressions.md5Upper(
        concat(col(idCol).cast("string"), lit(":"), i.cast("string"))),
      lit(11))
    val pri = array_max(transform(sequence(lit(1L), w), draw))
    // null ids are unsampleable (the family NULL rule): their draws
    // would be NULL priorities, and desc's NULLS-LAST still admits them
    // when fewer than k real rows exist
    Ranking.rankTop(
      df.where(col(idCol).isNotNull && w >= 1L).withColumn("_pri", pri),
      Seq(col("_pri").desc, col(idCol)), k, "_rk")
      .drop("_rk")
  }

  /** Deterministic train/val/test split assignment: cumulative cuts of
    * the content-keyed uniform, so a document's split NEVER changes as
    * the corpus grows (the property that keeps eval sets uncontaminated
    * across dataset versions — a seeded random split reshuffles
    * everything on every rebuild). `fractions` are (name, fraction)
    * in declared order and must sum to 1 within 1e-9; the final bucket
    * absorbs u up to 1.0 exactly. Pure narrow when-chain — zero
    * shuffle, composable under every other op here.
    *
    * Boundary determinism: the cut is compared in INTEGER space — the
    * raw 53-bit hash against floor(cum_micros · 2^53 / 10^6), where
    * cum_micros is the exact long sum of round(fraction · 10^6). A
    * double scanLeft would yield 0.8 + 0.1 = 0.9000000000000001, and
    * the one representable u per boundary ulp would classify
    * differently from an oracle comparing against literal 0.9 —
    * integer thresholds make the boundary bit-identical on every
    * engine (the float-free-keys rule applied to split cuts). */
  def assignSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], as: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    // a fraction below 5e-7 passes the > 0 check but rounds to 0 micros
    // — two adjacent thresholds collide and that bucket is silently
    // always-empty; fail loudly instead (raise the quantization if a
    // sub-micro split is ever a real need)
    fractions.foreach { case (name, f) =>
      require(math.round(f * 1e6) >= 1L,
        s"fraction for '$name' ($f) quantizes to 0 of 1e6 micros — " +
          "the split bucket would always be empty")
    }
    // raw 53-bit hash (the numerator of hashUniform, before the /2^53)
    val h = call_function("shiftrightunsigned",
      graft.functions.TextHashExpressions.md5Upper(col(keyCol).cast("string")),
      lit(11)) // long keys hash as their decimal string
    val cutMicros = fractions
      .map { case (_, f) => math.round(f * 1e6) }
      .scanLeft(0L)(_ + _).tail
    val thresholds = cutMicros.map(m =>
      ((BigInt(m) << 53) / 1000000).toLong) // floor division, exact in BigInt
    val expr = fractions.init.zip(thresholds.init).foldRight(
      lit(fractions.last._1): Column) {
      case (((name, _), cut), acc) => when(h < lit(cut), lit(name)).otherwise(acc)
    }
    // a NULL key has no identity to split on — without the filter every
    // when() is NULL-false and the fold's final otherwise() would dump
    // ALL null-key rows deterministically into the LAST declared split,
    // silently contaminating the held-out set (the family NULL rule)
    df.where(col(keyCol).isNotNull).withColumn(as, expr)
  }

  /** Budgeted corpus assembly — [[mixtureWeights]] actually ENFORCED:
    * each stratum contributes the prefix of its deterministic
    * (u(text), id) layout order whose docs START inside the stratum's
    * token allocation (the first doc crossing the boundary is kept, so
    * a stratum with enough data always covers its allocation). This is
    * the "build the actual α=0.5 mixture under a token budget" step a
    * pretraining pipeline runs after weighing sources.
    *
    * Scale shape: the start offsets come from [[Packing.layoutOffsets]]
    * (distributed prefix sum — no stratum-sized single task), and the
    * per-stratum allocations are a broadcast of the #strata-row weights
    * frame. Deterministic end to end: same corpus → same mixture, any
    * partitioning, any engine. */
  /** Exact integer WATER-FILLING level for a budgeted cap across
    * strata: the largest level c such that Σ min(mass_i, c) ≤ budget —
    * i.e. cap the dominant strata at c, keep everything below c whole.
    * This is the OTHER classic mixture curve next to [[mixtureWeights]]'
    * α = 0.5 temperature rule: temperature reshapes every stratum's
    * share smoothly; water-filling touches ONLY the strata above the
    * level (the CommonCrawl-dominates-the-mix fix) and provably wastes
    * none of the budget (no feasible level is higher).
    *
    * Derivation (all integer, oracle-replayable): sort masses
    * ascending; for each k = number of fully-kept smallest masses the
    * candidate level is (budget − prefix_k) div (d − k); every
    * candidate that actually fits (Σ min ≤ budget, checked exactly) is
    * feasible and the max such candidate IS the optimum — the true
    * level c* at its own k* satisfies c* ≤ its candidate, and every
    * validated candidate is ≤ c* by feasibility. When the whole corpus
    * fits the budget, the level pins to max(mass): nothing is capped. */
  def waterfillLevel(masses: Seq[Long], budget: Long): Long = {
    require(masses.nonEmpty, "waterfillLevel needs at least one stratum")
    require(masses.forall(_ >= 0) && budget >= 0,
      "masses and budget must be non-negative")
    val sorted = masses.sorted
    val d = sorted.size
    if (sorted.sum <= budget) return sorted.last
    val prefix = sorted.scanLeft(0L)(_ + _) // prefix(k) = Σ of k smallest
    def fits(c: Long) = sorted.map(m => math.min(m, c)).sum <= budget
    (0 until d).map(k => (budget - prefix(k)) / (d - k))
      .filter(c => c >= 0 && fits(c))
      .max // k = 0 gives budget div d, which always fits — never empty
  }

  /** Distributed water-fill: per-key mass totals, the level from
    * [[waterfillLevel]] over the (bounded, one row per stratum —
    * codebook-sized) collected profile with
    * budget = (budgetNumer · Σ mass) div budgetDenom, and each
    * stratum's allocation min(mass, level). One agg shuffle; the
    * profile fold is driver-side like the graph dials — an
    * unpartitioned window here would trip the repo's own guard.
    * Returns (key, mass, alloc, level, budget). */
  def waterfillAllocation(df: DataFrame, keyCol: String, massCol: Column,
      budgetNumer: Long, budgetDenom: Long): DataFrame = {
    require(budgetNumer >= 0 && budgetDenom >= 1,
      s"bad budget fraction $budgetNumer/$budgetDenom")
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(sum(massCol).as("mass"))
      .localCheckpoint(true) // the profile collect and the output read it
    val masses = perKey.select(col("mass")).collect().map(_.getLong(0)).toSeq
    val budget = budgetNumer * masses.sum / budgetDenom
    val level = waterfillLevel(masses, budget)
    perKey.select(col("key"), col("mass"),
      least(col("mass"), lit(level)).as("alloc"),
      lit(level).as("level"), lit(budget).as("budget"))
  }

  def budgetedAssembly(df: DataFrame, idCol: String, stratumCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    val alloc = mixtureWeights(df, stratumCol, textCol, budgetTokens)
      .select(col("stratum").as("_alloc_stratum"),
        col("sampled_tokens").as("alloc_tokens"))
    Packing.layoutOffsets(df, idCol, textCol, stratumCol)
      .join(broadcast(alloc), col(stratumCol) <=> col("_alloc_stratum"))
      .where(col("start_offset") < col("alloc_tokens"))
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        col("start_offset"), col("alloc_tokens"))
  }

  /** Temperature-based mixture weights across corpus strata (sources):
    * weight_i ∝ n_tokens_i^0.5, the α = 0.5 temperature-sampling rule
    * that upweights small sources relative to proportional sampling —
    * plus each source's share and its token allocation under
    * `budgetTokens`. The exponent is fixed at 0.5 because sqrt is
    * IEEE-correctly-rounded on every engine while pow(x, α) is not —
    * a generic α would be engine-specific.
    *
    * Float determinism: sqrt(n_tokens) is quantized to integer MICROS
    * (round ×1e6 → long) so the normalizing total is an exact integer
    * sum, and share = w_micro/total is one IEEE division of longs.
    * The normalizing total is a broadcast one-row aggregate joined back
    * (the PMI/zipf pattern, TextAnalysis) — NOT a whole-frame window:
    * an unpartitioned WindowExec would be harmless here (#strata rows)
    * but would fire Spark's single-partition warning on every run,
    * burying any REAL single-partition regression in noise. The two
    * plan branches share the per-stratum exchange (ReuseExchange), so
    * the corpus is still scanned once. */
  def mixtureWeights(df: DataFrame, stratumCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    val strata = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
      .withColumn("w_micro",
        round(sqrt(col("n_tokens").cast("double")) * 1e6, 0).cast("long"))
    val total = strata.agg(sum(col("w_micro")).as("total_micro"))
    strata.crossJoin(broadcast(total))
      .select(col("stratum"), col("n_docs"), col("n_tokens"), col("w_micro"),
        (col("w_micro").cast("double") / col("total_micro")).as("share"),
        round((col("w_micro").cast("double") / col("total_micro")) * budgetTokens, 0)
          .cast("long").as("sampled_tokens"))
  }
}
