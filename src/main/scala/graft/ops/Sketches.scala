package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable probabilistic sketches — the approximate operators a
  * 100 TB pipeline substitutes for exact forms, built on the repo's md5
  * hash chain so a second engine (the DuckDB oracle) reproduces every
  * estimate bit for bit, unlike the engine-private hashes inside
  * approx_count_distinct / approx_percentile. Shared design rules:
  * all register/counter arithmetic is exact integers (order-free sums),
  * floats appear only in the final one-or-two IEEE ops, and results are
  * rounded 6 (the repo-wide ulp contract).
  */
object Sketches {

  /** A built HyperLogLog sketch: the SPARSE register table (`_reg`
    * long, `_M` int — one row per non-empty register, so ≤ m = 2^p rows
    * regardless of input size) plus the precision it was built with.
    * This is the MERGEABLE form a 100 TB pipeline actually stores:
    * partial sketches built per partition/day/source union via
    * [[hllMerge]] (register-wise MAX — associative, commutative,
    * idempotent), so distinct counts compose incrementally without ever
    * re-reading history (the q51 partial-merge pattern applied to
    * sketch state). `p` travels in the handle so merging sketches of
    * different precisions is inexpressible. */
  final case class HllSketch(registers: DataFrame, p: Int)

  /** Build the sparse HLL register table for `keyCol` — one narrow hash
    * projection + one ≤m-row hash-agg. The row hash is the lower 52
    * bits of the first little-endian md5 half (DuckDB md5_number_upper
    * — the minhash-chain primitive), register = low p bits, rho =
    * leading-rank of the remaining 52−p bits via length(bin(w)) —
    * identical across engines. Present registers always carry _M ≥ 1
    * (w = 0 maps to rhoMax, any other w to ≥ 1), so "empty" is exactly
    * "absent from the table". */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 9): HllSketch =
    HllSketch(registerTable(df, keyCol, p, Nil), p)

  /** The ONE implementation of the hash → register → rho build,
    * generalized over grouping (the estimate-side twin is
    * [[estimateOver]]). NULL-key policy: globally, null keys are not
    * values and are filtered (COUNT DISTINCT semantics — a (null, null)
    * register row would count as present); per group, they survive as a
    * (group, null-register) PRESENCE row so an all-null-key group still
    * reports estimate 0 rather than vanishing. */
  private def registerTable(df: DataFrame, keyCol: String, p: Int,
      groupCols: Seq[String]): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val rhoMax = 53 - p
    val hp = graft.functions.TextHashExpressions
      .md5Upper(col(keyCol).cast("string"))
      .bitwiseAND(lit((1L << 52) - 1))
    val rho = when(col("_w") === 0L, lit(rhoMax))
      .otherwise(lit(rhoMax) - length(bin(col("_w"))))
    val g = groupCols.map(col)
    val base =
      if (groupCols.isEmpty) df.where(col(keyCol).isNotNull).select(hp.as("_hp"))
      else df.select(g :+ when(col(keyCol).isNotNull, hp).as("_hp"): _*)
    base
      .select(g ++ Seq(
        col("_hp").bitwiseAND(lit((m - 1).toLong)).as("_reg"),
        shiftright(col("_hp"), p).as("_w")): _*)
      .select(g ++ Seq(col("_reg"), rho.as("_rho")): _*)
      .groupBy(g :+ col("_reg"): _*).agg(max(col("_rho")).as("_M"))
  }

  /** Union of sketches: register-wise MAX. The HLL merge law —
    * merge(sketch(A), sketch(B)) has BIT-IDENTICAL registers to
    * sketch(A ∪ B), because max is associative/commutative/idempotent —
    * so estimates over merged partials equal the monolithic build
    * exactly (asserted in SketchesSpec, oracle-checked by q63). Cost:
    * one ≤(k·m)-row union + m-bounded hash-agg, input-size-free. */
  def hllMerge(sketches: Seq[HllSketch]): HllSketch = {
    require(sketches.nonEmpty, "hllMerge needs at least one sketch")
    val ps = sketches.map(_.p).distinct
    require(ps.size == 1,
      s"cannot merge sketches of different precisions: p ∈ ${ps.mkString("{", ",", "}")}")
    HllSketch(
      sketches.map(_.registers).reduce(_ unionByName _)
        .groupBy(col("_reg")).agg(max(col("_M")).as("_M")),
      ps.head)
  }

  /** Grouped register build, public form: one sparse (groupCols...,
    * _reg, _M) table per group for `keyCol`'s values — the primitive a
    * caller composes when the GROUPS are the unit of merging (e.g.
    * HyperBall's per-node neighbourhood registers in
    * [[Graph.neighborhoodSizes]], where each graph round max-merges a
    * neighbour's register rows into the node's). Same hash → register →
    * rho arithmetic as [[hllRegisters]] — one implementation, so any
    * register table this returns estimates via [[estimateRegistersBy]]
    * and merges with plain groupBy(group, _reg).max(_M). */
  def registersByGroup(df: DataFrame, keyCol: String, p: Int,
      groupCols: Seq[String]): DataFrame =
    registerTable(df, keyCol, p, groupCols)

  /** Per-group estimate over an externally assembled register table
    * (the read side of [[registersByGroup]]): `regs` is
    * (groupCols..., _reg, _M) — possibly max-merged across many
    * partial builds — and the output is one (groupCols..., `as`) row
    * per group, computed by the SAME estimate arithmetic as
    * [[hllEstimate]]. `p` must be the precision the registers were
    * built with (register indices and rho widths are meaningless under
    * any other p — the HllSketch handle makes this inexpressible for
    * the unsparsed forms; here the caller owns the pairing). */
  def estimateRegistersBy(regs: DataFrame, groupCols: Seq[String], p: Int,
      as: String): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    estimateOver(regs, groupCols, p, as)
  }

  /** Distinct-count estimate from a register table, as ONE row (`as`:
    * double, round 6). The Σ2^−M register sum is the EXACT integer
    * SUM(2^(rhoMax−M)) over present registers plus (m − V)·2^rhoMax for
    * the absent ones — bounded by m·2^(53−p) = 2^53, order-free — with
    * the single IEEE division at the end and the standard small-range
    * correction (m·ln(m/V) when raw ≤ 2.5m with empty registers).
    * Bit-identical to materializing the dense m-row table first. */
  def hllEstimate(sketch: HllSketch, as: String = "hll_est"): DataFrame =
    estimateOver(sketch.registers, Nil, sketch.p, as)

  /** Flajolet et al. give the asymptotic alpha only for m >= 128
    * (p >= 7); the small register counts have tabulated constants. */
  private def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The ONE implementation of the estimate arithmetic (see
    * [[hllEstimate]]'s contract doc), generalized over grouping: a
    * (groupCols..., _reg, _M) table estimates per group; empty
    * groupCols is the global one-row form. (StreamOps.estimateFromRegs
    * deliberately replicates this in JVM code for the streaming state
    * fold — the stream==batch spec equality is what pins the replica.) */
  private def estimateOver(regs: DataFrame, groupCols: Seq[String], p: Int,
      as: String): DataFrame = {
    val m = 1 << p
    val rhoMax = 53 - p
    val scale = math.pow(2.0, rhoMax) // exact power of two
    val raw = lit(alphaFor(m)) * lit(m.toDouble) * lit(m.toDouble) * lit(scale) / col("_s")
    val g = groupCols.map(col)
    regs
      .groupBy(g: _*)
      // count(_M), not count(*): a null-register presence row (all-null
      // group, hllDistinctByGroup) keeps its group alive without
      // counting as a present register; the shiftleft sum skips it too
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($rhoMax - _M AS INT))")).as("_sp"),
        count(col("_M")).as("_v"))
      .select(g ++ Seq(
        (coalesce(col("_sp"), lit(0L)) +
          (lit(m.toLong) - col("_v")) * lit(1L << rhoMax)).as("_s"),
        (lit(m.toLong) - col("_v")).as("_zeros")): _*)
      .select(g :+ round(
        when(raw <= lit(2.5 * m) && col("_zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("_zeros")))
          .otherwise(raw), 6).as(as): _*)
  }

  /** HyperLogLog distinct-count estimate of `keyCol` as ONE row — the
    * one-shot composition of [[hllRegisters]] + [[hllEstimate]]. Scale:
    * one narrow hash projection + an m-row hash-agg — register state is
    * constant-size regardless of input. */
  def hllDistinct(df: DataFrame, keyCol: String, p: Int = 9,
      as: String = "hll_est"): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, p), as)

  /** PER-GROUP HyperLogLog distinct counts — the form a 100 TB
    * dashboard query actually runs (distinct users per event type /
    * day / source) where exact count-distinct would shuffle every
    * (group, key) pair: this shuffles at most groups × m register rows.
    * Two bounded hash-aggs: (group, register) MAX-of-rho, then a
    * per-group estimate with the identical exact-integer register sum,
    * alpha, and small-range correction as [[hllEstimate]] (documented
    * there) — so a group's estimate equals what a dedicated
    * [[hllDistinct]] over that group's rows would produce, and partial
    * register tables remain mergeable per group by register-wise MAX. */
  def hllDistinctByGroup(df: DataFrame, groupCol: String, keyCol: String,
      p: Int = 9, as: String = "hll_est"): DataFrame =
    hllDistinctByGroups(df, Seq(groupCol), keyCol, p, as)

  /** [[hllDistinctByGroup]] over a COMPOSITE group key — the form the
    * sliding-window distinct (q92's (event_type, day) frame) needs at
    * billion-user scale: state is groups × m register rows however many
    * users contribute, and the estimate arithmetic is the same
    * oracle-checkable integer ladder as the single-key form. */
  def hllDistinctByGroups(df: DataFrame, groupCols: Seq[String],
      keyCol: String, p: Int = 9, as: String = "hll_est"): DataFrame = {
    require(groupCols.nonEmpty,
      "hllDistinctByGroups needs at least one group column (use hllDistinct for the global form)")
    estimateOver(registerTable(df, keyCol, p, groupCols), groupCols, p, as)
  }

  /** Count-min cell for hash row `r`: the Kirsch–Mitzenmacher
    * construction (a + r·b) & (width−1) with a, b the two 26-bit halves
    * of ONE md5 per key — one hash per row regardless of depth, and the
    * sums stay ≤ 2²⁶ + depth·2²⁶ < 2³⁰ for the allowed depth range (no
    * overflow divergence between Spark's wrapping longs and a
    * checked-arithmetic oracle engine). */
  private def kmHalves(key: Column): (Column, Column) = {
    val mask26 = (1L << 26) - 1
    val h = graft.functions.TextHashExpressions.md5Upper(key.cast("string"))
    (h.bitwiseAND(lit(mask26)), shiftright(h, 26).bitwiseAND(lit(mask26)))
  }

  private def cmCell(width: Int): Column =
    (col("_a") + col("_r") * col("_b0")).bitwiseAND(lit((width - 1).toLong))

  /** A built count-min sketch: the bounded counter table plus the
    * parameters it was built with — estimation reuses them from here,
    * so a build/probe depth-or-width mismatch (which would silently
    * void the one-sided guarantee) cannot be expressed. */
  final case class CountMinSketch(counters: DataFrame, depth: Int, width: Int)

  /** Count-min counter table for `keyCol`: depth×width rows REGARDLESS
    * of input size or key cardinality — frequency state that fits in
    * memory when distinct keys don't. One explode(×depth) + hash-agg
    * pass. `width` must be a power of two, at most 2²⁶ (the cell hash
    * is built from 26-bit md5 halves — wider tables would leave cells
    * the hash cannot reach). */
  def countMinCounters(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): CountMinSketch = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2 && width <= (1 << 26) && (width & (width - 1)) == 0,
      s"width must be a power of two in [2, 2^26], got $width")
    val (a, b0) = kmHalves(col(keyCol))
    // NULL keys are not values (the sketch-family rule): they would
    // materialize depth (r, NULL) cells no probe can ever equi-join
    val counters = df.where(col(keyCol).isNotNull)
      .select(a.as("_a"), b0.as("_b0"))
      .select(col("_a"), col("_b0"),
        explode(sequence(lit(0), lit(depth - 1))).as("_r"))
      .select(col("_r"), cmCell(width).as("_b"))
      .groupBy(col("_r"), col("_b"))
      .agg(count(lit(1)).as("_n"))
    CountMinSketch(counters, depth, width)
  }

  /** Frequency estimates for the keys of `keys` (all its columns are
    * carried through, ROW-PRESERVING: N probe rows in, N rows out —
    * duplicate probe rows each get their estimate, discriminated by a
    * transient row id through the depth-min fold; a bare groupBy over
    * the carried columns would silently merge identical rows and
    * return fewer rows than probed): est_n = MIN over the key's depth
    * counters, with untouched counters counting as ZERO — the exact
    * count-min estimator, so every probe key survives (keys absent
    * from the sketch input estimate 0 unless every cell collided) and
    * the one-sided guarantee est_n ≥ true count holds unconditionally. */
  def countMinEstimate(keys: DataFrame, sketch: CountMinSketch,
      keyCol: String): DataFrame = {
    val carried = keys.columns.map(col)
    val (a, b0) = kmHalves(col(keyCol))
    keys
      .withColumn("_row", monotonically_increasing_id())
      .select(carried :+ col("_row") :+ a.as("_a") :+ b0.as("_b0"): _*)
      .select(carried :+ col("_row") :+ col("_a") :+ col("_b0") :+
        explode(sequence(lit(0), lit(sketch.depth - 1))).as("_r"): _*)
      .withColumn("_b", cmCell(sketch.width))
      .join(sketch.counters, Seq("_r", "_b"), "left")
      .groupBy(carried :+ col("_row"): _*)
      .agg(min(coalesce(col("_n"), lit(0L))).as("est_n"))
      .drop("_row")
  }

  /** Equi-join SIZE estimation from two count-min sketches — the
    * pre-flight cardinality check a planner (or an engineer deciding
    * whether a join is runnable at all) wants BEFORE shuffling
    * anything: |A ⋈ B| = Σ_k n_A(k)·n_B(k) is estimated by the
    * count-min inner product, min over depth rows of Σ_cell
    * n_a(r,c)·n_b(r,c) — one-sided (est ≥ true, collisions only ever
    * add) and exact-integer, so it is oracle-checkable. Cost: a join of
    * two depth×width-bounded counter tables — input-size-free. Both
    * sketches must share (depth, width); a depth row with no
    * overlapping cells contributes inner product 0 (the spine join —
    * dropping it would silently skip the best row). Products and sums
    * are longs: valid while |A|·|B| < 2⁶³ (≈9·10¹⁸ — beyond that, cast
    * the counters to decimal(38,0) on both engines). */
  def countMinJoinSize(a: CountMinSketch, b: CountMinSketch,
      as: String = "est_join_rows"): DataFrame = {
    require(a.depth == b.depth && a.width == b.width,
      s"sketch shapes differ: ${(a.depth, a.width)} vs ${(b.depth, b.width)}")
    val spark = a.counters.sparkSession
    val ips = a.counters.withColumnRenamed("_n", "_na")
      .join(b.counters.withColumnRenamed("_n", "_nb"), Seq("_r", "_b"))
      .groupBy(col("_r")).agg(sum(col("_na") * col("_nb")).as("_ip"))
    spark.range(a.depth).select(col("id").cast("int").as("_r"))
      .join(ips, Seq("_r"), "left")
      .agg(min(coalesce(col("_ip"), lit(0L))).as(as))
  }

  /** A built Bloom filter: the sparse SET-BIT table (`_bit` long — one
    * row per set bit, ≤ numBits rows regardless of input size) plus the
    * parameters it was built with, so probing with mismatched hash
    * count or width (which would silently void the no-false-negative
    * guarantee) cannot be expressed. Like [[HllSketch]], this is the
    * MERGEABLE form: partial filters built per partition/day/source
    * union via [[bloomMerge]] (set union of bits — associative,
    * commutative, idempotent), bit-identical to the monolithic build. */
  final case class BloomFilter(bits: DataFrame, numHashes: Int, numBits: Int)

  /** Build the sparse set-bit table for `keyCol`: bit positions use the
    * same Kirsch–Mitzenmacher construction as count-min — position_r =
    * (a + r·b) & (numBits−1) with a, b the two 26-bit md5 halves of ONE
    * hash per key — so the build is one narrow hash projection, one
    * explode(×numHashes), and a ≤numBits-row distinct. `numBits` must
    * be a power of two ≤ 2²² — small enough that the probe side can
    * densify it into a ≤512 KB bitmap LITERAL (see
    * [[bloomMightContain]]), which is the point of the operator:
    * membership pruning of a 100 TB probe side with zero shuffle of
    * the probe data. */
  def bloomBits(df: DataFrame, keyCol: String,
      numHashes: Int = 4, numBits: Int = 1 << 16): BloomFilter = {
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes must be in [1,8], got $numHashes")
    require(numBits >= 2 && numBits <= (1 << 22) && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two in [2, 2^22], got $numBits")
    val (a, b0) = kmHalves(col(keyCol))
    // NULL keys are not members (a NULL bit row would NPE the probe's
    // driver-side densify loop, and NULL matches nothing in SQL anyway)
    val bits = df.where(col(keyCol).isNotNull)
      .select(a.as("_a"), b0.as("_b0"))
      .select(col("_a"), col("_b0"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("_r"))
      .select(cmCell(numBits).as("_bit"))
      .distinct()
    BloomFilter(bits, numHashes, numBits)
  }

  /** Union of Bloom filters: set union of their bit tables. Merge law:
    * bits(A) ∪ bits(B) is BIT-IDENTICAL to bits(A ∪ B) — union of sets
    * is associative/commutative/idempotent — so partial filters over
    * disjoint slices compose into the exact monolithic filter
    * (asserted in SketchesSpec). */
  def bloomMerge(filters: Seq[BloomFilter]): BloomFilter = {
    require(filters.nonEmpty, "bloomMerge needs at least one filter")
    val params = filters.map(f => (f.numHashes, f.numBits)).distinct
    require(params.size == 1,
      s"cannot merge filters of different shapes: ${params.mkString("{", ",", "}")}")
    BloomFilter(
      filters.map(_.bits).reduce(_ unionByName _).distinct(),
      params.head._1, params.head._2)
  }

  /** Membership probe: `keys` plus a boolean `might_contain` — true iff
    * ALL numHashes positions are set. The Bloom guarantee: never false
    * for a key the filter was built on (no false negatives); true for
    * an absent key only on full collision (false-positive rate ≈
    * (1−e^{−kn/m})^k).
    *
    * The probe is a PURE NARROW projection — zero shuffle, zero join:
    * the bit table (≤ numBits/64 longs, ≤ 512 KB at the 2^22-bit
    * build bound — same contract as bloomBits) is
    * collected once into a dense bitmap array literal — the d10
    * centroid-literal pattern, constant driver state — and each of the
    * k positions is tested with element_at + bitwise AND inside
    * whole-stage codegen. That is the operator's point at 100 TB:
    * membership pruning of an arbitrarily large probe side at scan
    * speed, no movement of probe data at all. */
  def bloomMightContain(keys: DataFrame, filter: BloomFilter,
      keyCol: String, as: String = "might_contain"): DataFrame = {
    val words = new Array[Long](math.max(filter.numBits / 64, 1))
    // densify EXECUTOR-SIDE before collecting: a well-filled 2^22-bit
    // filter has up to ~4M set-bit rows, and collecting them as Row
    // objects to OR on the driver is a few hundred MB of transient
    // driver allocation for a 512 KB bitmap; the word-level bit_or agg
    // collects at most numBits/64 = 65536 rows instead
    val bitCol = col(filter.bits.columns(0))
    filter.bits
      .select(shiftright(bitCol, 6).cast("int").as("_w"),
        call_function("shiftleft", lit(1L),
          bitCol.bitwiseAND(lit(63L)).cast("int")).as("_m"))
      .groupBy(col("_w")).agg(expr("bit_or(_m)").as("_word"))
      .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    val bitmap = typedlit(words.toSeq)
    val (a, b0) = kmHalves(col(keyCol))
    val checks = (0 until filter.numHashes).map { r =>
      val pos = (a + lit(r.toLong) * b0).bitwiseAND(lit((filter.numBits - 1).toLong))
      element_at(bitmap, shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int"))) =!= 0L
    }
    // coalesce: a NULL probe key hashes to NULL checks; NULL is never a
    // member (the build-side rule), so the answer is a definite false —
    // not SQL three-valued NULL, which would make NOT(might_contain)
    // silently drop those rows
    keys.withColumn(as, coalesce(checks.reduce(_ && _), lit(false)))
  }

  /** Exact percentile-disc over a DETERMINISTIC content-keyed reservoir:
    * the `cap` rows with the smallest md5 of `tieKey` (TakeOrdered —
    * never a global sort of the value column), value at sorted position
    * (n+1) DIV 2 — a median estimate whose "randomness" is content-
    * addressed, so re-runs, shards, and a second engine draw the
    * identical sample. PRECONDITION: `tieKey` must be unique per row
    * (same contract as Sampling's idCol) — duplicate key content at the
    * cap boundary would make the kept row, and thus the sample,
    * engine-dependent. One row out, named `as`; empty input yields an
    * empty frame (no sample → no median), unlike hllDistinct whose
    * empty-input estimate is a defined 0-row. */
  /** PER-GROUP [[sampledMedian]]: each group gets its own deterministic
    * content-keyed reservoir (the `cap` rows with smallest md5(tieKey)
    * WITHIN the group) and its exact percentile-disc over that sample.
    * The per-group rank ≤ cap filter plans as WindowGroupLimit on both
    * sides of the exchange (the d14 capPerKey property), so each map
    * task ships at most `cap` rows per group — a dominant group costs
    * cap·partitions shuffled rows, not its population; the median
    * itself is the windowless sort_array/element_at aggregation over
    * ≤cap rows per group. Same tieKey-uniqueness precondition as
    * [[sampledMedian]]. */
  def sampledMedianByGroup(df: DataFrame, groupCol: String, value: Column,
      tieKey: Column, cap: Int, as: String): DataFrame =
    sampledPercentileByGroup(df, groupCol, value, tieKey, cap, 0.5, as)

  /** [[sampledMedianByGroup]] at any percentile: PERCENTILE_DISC(pct)
    * over each group's deterministic reservoir — position ceil(pct·n)
    * in (value, tieKey) order, the SQL discrete-percentile contract
    * (pct 0.5 ⟹ ceil(n/2) == (n+1) DIV 2, exactly the median form this
    * generalizes). Same plan shape and tieKey-uniqueness precondition.
    * `pct` is interpreted at MICRO precision (rounded to 1e-6) and the
    * position is computed in exact integer arithmetic,
    * (n·pct_micro + 999999) DIV 10⁶ — a double ceil(n·pct) is off by
    * one whenever n·pct rounds up across an integer (pct 0.07, n 100 →
    * 7.000000000000001 → 8), within one engine, not just across two. */
  def sampledPercentileByGroup(df: DataFrame, groupCol: String, value: Column,
      tieKey: Column, cap: Int, pct: Double, as: String): DataFrame = {
    require(pct > 0.0 && pct <= 1.0, s"pct must be in (0,1], got $pct")
    val pctMicro = math.round(pct * 1e6)
    require(pctMicro >= 1, s"pct must be >= 1e-6, got $pct")
    import org.apache.spark.sql.expressions.Window
    val wCap = Window.partitionBy(col("_g")).orderBy(col("_k"))
    // NULL values are not observations (the sketch-family rule, same as
    // logHistCounts/hllDistinct): a NULL _c struct would sort FIRST in
    // sort_array and occupy rank positions, shifting the percentile.
    // The tieKey is cast to string (md5 requires it; numeric keys hash
    // as their decimal rendering, the hashUniform rule) and coalesced
    // so a null tieKey cannot hash to NULL and preferentially consume
    // the reservoir cap.
    df.select(col(groupCol).as("_g"), value.as("_c"),
        md5(coalesce(tieKey.cast("string"), lit(""))).as("_k"))
      .where(col("_c").isNotNull)
      .withColumn("_rk", row_number().over(wCap))
      .where(col("_rk") <= cap)
      .groupBy(col("_g"))
      .agg(sort_array(collect_list(struct(col("_c"), col("_k")))).as("_arr"))
      .select(col("_g").as(groupCol), element_at(col("_arr"),
        expr(s"CAST((size(_arr) * ${pctMicro}L + 999999) DIV 1000000 AS INT)"))
        .getField("_c").as(as))
  }

  /** Mergeable log₂-bucket quantile sketch (HDR-histogram style) — the
    * 100 TB percentile path, completing the sketch family (HLL counts
    * distincts, CMS counts frequencies, Bloom answers membership; this
    * answers quantiles). A non-negative long value maps to bucket
    * (e, idx): e = floor(log₂ v) via the engine-portable
    * `length(bin(v)) - 1`, idx = the value's position among the 2^subBits
    * equal-width sub-ranges of octave e — so state is AT MOST
    * 64·2^subBits counters regardless of input size, counters merge by
    * ADDITION (a grouped count is associative — shards, days, or engines
    * combine exactly), and any quantile's estimate (the target bucket's
    * lower bound) carries relative error < 2^−subBits, one-sided (never
    * above the true value). Everything is exact integer arithmetic, so
    * the same ladder replays hash-exact in DuckDB (the q99 oracle).
    * Values < 1 collapse to bucket −1 (estimate 0); negative inputs are
    * OUT of contract (clamp or shift at the call site).
    *
    * Returns (bkey, cnt): bkey = e·2^subBits + idx, monotone in v — so
    * bucket order IS value order and ranks resolve by bkey scan. */
  /** The bucket-key ladder over a long column named `_v` (shared by the
    * global and grouped histogram builders — ONE derivation, like
    * cmCell, so the forms can never drift). */
  private def bkeyCase(subBits: Int): String = {
    val m = 1L << subBits
    s"""CASE WHEN _v < 1L THEN -1L ELSE
       |  (length(bin(_v)) - 1) * ${m}L +
       |  (_v - shiftleft(1L, length(bin(_v)) - 1)) div
       |    shiftleft(1L, greatest(length(bin(_v)) - 1 - $subBits, 0))
       |END""".stripMargin
  }

  /** Bucket lower-bound reconstruction from a bkey expression `k`
    * (negative keys — the sub-1 bucket or "not found" — estimate 0). */
  private def lowerBoundCase(k: String, subBits: Int): String = {
    val m = 1L << subBits
    s"""CASE WHEN $k < 0L THEN 0L ELSE
       |  shiftleft(1L, CAST($k div ${m}L AS INT)) +
       |  ($k % ${m}L) *
       |    shiftleft(1L, greatest(CAST($k div ${m}L AS INT) - $subBits, 0))
       |END""".stripMargin
  }

  /** Per-pct rank scan over the one-row sorted histogram array `_h`
    * with total `n`: first bucket whose cumulative count reaches
    * ceil(n·pct_milli/1000), as (pct_milli, _k) structs. */
  private def pctScanCols(pctsMilli: Seq[Int]): Seq[Column] =
    pctsMilli.map { p =>
      val found =
        s"""aggregate(_h, named_struct('c', 0L, 'k', -2L),
           |  (a, x) -> named_struct('c', a.c + x.cnt,
           |    'k', CASE WHEN a.k = -2L AND a.c + x.cnt >= (n * ${p}L + 999L) div 1000L
           |              THEN x.bkey ELSE a.k END)).k""".stripMargin
      struct(lit(p.toLong).as("pct_milli"), expr(found).as("_k"))
    }

  def logHistCounts(df: DataFrame, value: Column, subBits: Int = 4): DataFrame = {
    require(subBits >= 1 && subBits <= 8, s"subBits must be in [1,8], got $subBits")
    // null values are not observations (the repo-wide sketch rule) — a
    // null would otherwise ladder into a null bkey whose rank-scan
    // behavior is engine-dependent
    df.select(value.cast("long").as("_v"))
      .where(col("_v").isNotNull)
      .select(expr(bkeyCase(subBits)).as("bkey", subBitsMeta(subBits)))
      .groupBy(col("bkey")).agg(count(lit(1)).as("cnt"))
  }

  /** The histogram's subBits, stamped onto the bkey column as metadata
    * so the RESOLVERS can reject a mismatched ladder: bkey = e·2^subBits
    * + idx is decoded with the same subBits, and a drifted value would
    * silently reconstruct wrong lower bounds. Metadata survives
    * groupBy/union, so the check travels with the counts frame. */
  private def subBitsMeta(subBits: Int) =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.logHist.subBits", subBits.toLong).build()

  private def requireSubBitsMatch(counts: DataFrame, subBits: Int): Unit = {
    val meta = counts.schema.fields.find(_.name == "bkey").map(_.metadata)
    meta.filter(_.contains("graft.logHist.subBits")).foreach { m =>
      val stamped = m.getLong("graft.logHist.subBits")
      require(stamped == subBits.toLong,
        s"histogram was built with subBits=$stamped but resolver got $subBits")
    }
  }

  /** PER-GROUP [[logHistCounts]]: one ≤64·2^subBits-counter histogram
    * per group — per-group latency/price/size percentiles, the
    * production shape. Same ladder ([[bkeyCase]]), same merge-by-
    * addition law per (group, bkey). */
  def logHistCountsByGroups(df: DataFrame, groupCols: Seq[String],
      value: Column, subBits: Int = 4): DataFrame = {
    require(subBits >= 1 && subBits <= 8, s"subBits must be in [1,8], got $subBits")
    require(groupCols.nonEmpty, "use logHistCounts for the global form")
    df.select(groupCols.map(col) :+ value.cast("long").as("_v"): _*)
      .where(col("_v").isNotNull)
      .select(groupCols.map(col) :+
        expr(bkeyCase(subBits)).as("bkey", subBitsMeta(subBits)): _*)
      .groupBy(groupCols.head, (groupCols.tail :+ "bkey"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** PER-GROUP [[logHistQuantiles]]: each group's histogram folds to one
    * sorted array (a KEYED aggregate over ≤64·2^subBits rows per group —
    * no window, guard-clean) and each rank resolves with the same HOF
    * scan. Output: (groupCols…, pct_milli, n, est), one row per
    * (group, pct). */
  def logHistQuantilesByGroups(counts: DataFrame, groupCols: Seq[String],
      pctsMilli: Seq[Int], subBits: Int = 4): DataFrame = {
    require(pctsMilli.nonEmpty && pctsMilli.forall(p => p >= 1 && p <= 1000),
      s"pcts must be milli-units in [1,1000], got $pctsMilli")
    requireSubBitsMatch(counts, subBits)
    val gs = groupCols.map(col)
    counts
      .groupBy(gs: _*)
      .agg(sort_array(collect_list(struct(col("bkey"), col("cnt")))).as("_h"))
      .withColumn("n", expr("aggregate(_h, 0L, (a, x) -> a + x.cnt)"))
      .select(gs :+ col("n") :+ explode(array(pctScanCols(pctsMilli): _*)).as("r"): _*)
      .select(gs :+ col("r.pct_milli").as("pct_milli") :+ col("n") :+
        expr(lowerBoundCase("r._k", subBits)).as("est"): _*)
  }

  /** WEIGHTED [[logHistCounts]]: per-bucket totals are Σweight instead
    * of row counts, which turns the resolvers into weighted quantiles —
    * "the value v such that p% of total WEIGHT lies at or below v"
    * (byte-weighted median document size, token-weighted length
    * percentiles — the storage/token-budget planning metrics). The
    * resolvers need no change: rank arithmetic is over whatever the
    * cnt column sums to. Weights must be non-negative longs — ENFORCED
    * per row at execution time (assert_true in the projection, no
    * extra job): a negative weight silently corrupts the resolvers'
    * cumulative ranks, so it fails the job instead. Null values OR
    * null weights are not observations. All-zero weights are a
    * DEGENERATE histogram, not an error: total weight 0 makes every
    * rank_p = 0, and the resolvers latch the FIRST bucket — est is the
    * lowest observed bucket's lower bound with n = 0, NOT the empty-
    * input (n = 0, est = 0) shape (consistent on both engines; callers
    * who need the distinction should check n > 0 AND nonempty input).
    * Same merge-by-addition law, same subBits stamp. */
  def logHistWeightedCounts(df: DataFrame, value: Column, weight: Column,
      subBits: Int = 4): DataFrame = {
    require(subBits >= 1 && subBits <= 8, s"subBits must be in [1,8], got $subBits")
    df.select(value.cast("long").as("_v"), weight.cast("long").as("_w"))
      .where(col("_v").isNotNull && col("_w").isNotNull)
      .select(expr(bkeyCase(subBits)).as("bkey", subBitsMeta(subBits)),
        when(col("_w") >= 0, col("_w")).otherwise(raise_error(concat(
          lit("logHistWeightedCounts: negative weight "), col("_w"),
          lit(" would corrupt cumulative ranks")))).as("_w"))
      .groupBy(col("bkey")).agg(sum(col("_w")).as("cnt"))
  }

  /** Merge law of [[logHistCounts]] made explicit: histograms over
    * disjoint shards combine by summing per-bucket counts — the
    * associativity that lets 1000 executors (or 1000 days) each keep a
    * ≤64·2^subBits-counter sketch and reduce them exactly.
    *
    * Every input's subBits stamp must agree: the schemas of a
    * subBits=4 and a subBits=5 histogram are identical, unionByName
    * succeeds, the FIRST frame's metadata survives, and the downstream
    * requireSubBitsMatch would pass — a silent wrong-quantile merge,
    * exactly the drift the stamp exists to reject. Unstamped inputs
    * (hand-built frames) are tolerated, matching the resolvers. */
  def logHistMerge(histograms: Seq[DataFrame]): DataFrame = {
    require(histograms.nonEmpty, "nothing to merge")
    val stamps = histograms.flatMap(
      _.schema.find(_.name == "bkey").map(_.metadata)
        .filter(_.contains("graft.logHist.subBits"))
        .map(_.getLong("graft.logHist.subBits"))).distinct
    require(stamps.size <= 1,
      "cannot merge histograms built with different subBits ladders: " +
        s"subBits=${stamps.sorted.mkString(", ")}")
    histograms.reduce(_ unionByName _)
      .groupBy(col("bkey")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates from a [[logHistCounts]] histogram. Percentile-
    * disc semantics in exact integers: rank_p = ceil(n·p) computed as
    * (n·pct_milli + 999) DIV 1000 (pct at MILLI precision — p999 = the
    * 99.9th percentile; a double ceil is off-by-one whenever n·p rounds
    * up across an integer), estimate = lower bound of the first bucket
    * whose cumulative count reaches the rank — one-sided ≤ true value,
    * relative error < 2^−subBits. The histogram is first folded to ONE
    * sorted array row (a grouping-free aggregate over ≤64·2^subBits
    * rows — bounded by construction, no window, guard-clean) and each
    * rank resolves with a single HOF scan of that array. Output: one
    * row per requested pct — (pct_milli, n, est). Empty input yields
    * n = 0, est = 0. */
  def logHistQuantiles(counts: DataFrame, pctsMilli: Seq[Int],
      subBits: Int = 4): DataFrame = {
    require(pctsMilli.nonEmpty && pctsMilli.forall(p => p >= 1 && p <= 1000),
      s"pcts must be milli-units in [1,1000], got $pctsMilli")
    requireSubBitsMatch(counts, subBits)
    counts
      .agg(sort_array(collect_list(struct(col("bkey"), col("cnt")))).as("_h"))
      .select(col("_h"), expr("aggregate(_h, 0L, (a, x) -> a + x.cnt)").as("n"))
      .select(col("n"), explode(array(pctScanCols(pctsMilli): _*)).as("r"))
      .select(col("r.pct_milli").as("pct_milli"), col("n"),
        expr(lowerBoundCase("r._k", subBits)).as("est"))
  }

  /** One-shot [[logHistCounts]] → [[logHistQuantiles]]. */
  def hdrQuantiles(df: DataFrame, value: Column, pctsMilli: Seq[Int],
      subBits: Int = 4): DataFrame =
    logHistQuantiles(logHistCounts(df, value, subBits), pctsMilli, subBits)

  def sampledMedian(df: DataFrame, value: Column, tieKey: Column,
      cap: Int, as: String): DataFrame = {
    // null-value filter + string-cast/coalesced tieKey: the
    // sampledPercentileByGroup rules (see there), applied to the
    // global form
    val samp = df.select(value.as("_c"),
        md5(coalesce(tieKey.cast("string"), lit(""))).as("_k"))
      .where(col("_c").isNotNull)
      .orderBy(col("_k")).limit(cap)
    // One windowless agg over the ≤cap-row sample: sort_array orders by
    // (_c, _k) exactly like the ORDER BY the previous row_number form
    // used, and element_at picks position (n+1) DIV 2 — same value,
    // no unpartitioned-window warning in every bench/verify tail.
    samp
      .agg(sort_array(collect_list(struct(col("_c"), col("_k")))).as("_arr"))
      .where(size(col("_arr")) > 0) // empty input stays an empty frame
      .select(element_at(col("_arr"),
        ((size(col("_arr")) + 1) / lit(2)).cast("int")).getField("_c").as(as))
  }
}
