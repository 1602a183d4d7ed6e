package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator-level laws of the portable sketches — the q59/q62 oracles
  * prove cross-engine exactness on the fixture; these prove the
  * ESTIMATOR properties on controlled inputs. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: within the m=512 error envelope across cardinalities") {
    for (n <- Seq(100, 1000, 5000)) {
      val df = (1 to n).map(i => s"key-$i").toDF("k")
      val est = Sketches.hllDistinct(df, "k").collect()(0).getDouble(0)
      // standard error 1.04/sqrt(512) ~ 4.6%; 15% is a >3-sigma bound
      assert(math.abs(est - n) / n < 0.15, s"n=$n est=$est")
    }
  }

  test("hllDistinct: depends only on the distinct key set (duplicates are free)") {
    val base = (1 to 800).map(i => s"key-$i")
    val once = Sketches.hllDistinct(base.toDF("k"), "k").collect()(0).getDouble(0)
    val tripled = Sketches.hllDistinct(
      (base ++ base ++ base).toDF("k"), "k").collect()(0).getDouble(0)
    assert(once == tripled)
  }

  test("countMin: est >= true for every key; counter state is depth x width bounded") {
    // skewed frequencies: key i appears i times
    val rows = (1 to 200).flatMap(i => Seq.fill(i)(s"k$i")).toDF("k")
    val sketch = Sketches.countMinCounters(rows, "k", depth = 4, width = 256)
    assert(sketch.counters.count() <= 4L * 256)
    val truth = rows.groupBy("k").agg(count(lit(1)).as("true_n"))
    val est = Sketches.countMinEstimate(truth, sketch, "k")
      .collect().map(r => (r.getAs[Long]("true_n"), r.getAs[Long]("est_n")))
    assert(est.length == 200)
    assert(est.forall { case (t, e) => e >= t },
      s"one-sided guarantee violated: ${est.filter { case (t, e) => e < t }.mkString(",")}")
    // probing keys ABSENT from the sketch input: every probe key
    // survives, and untouched cells count as zero (exact estimator)
    val foreign = Seq("zz1", "zz2", "zz3").toDF("k")
    val fest = Sketches.countMinEstimate(foreign, sketch, "k")
      .collect().map(r => r.getAs[Long]("est_n"))
    assert(fest.length == 3)
    assert(fest.forall(_ >= 0L))
  }

  test("hllMerge law: merge of partials has bit-identical registers and estimate to the monolithic build") {
    val a = (1 to 600).map(i => s"key-$i").toDF("k")
    val b = (400 to 1000).map(i => s"key-$i").toDF("k") // overlaps a
    val union = (1 to 1000).map(i => s"key-$i").toDF("k")
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllRegisters(a, "k"), Sketches.hllRegisters(b, "k")))
    val mono = Sketches.hllRegisters(union, "k")
    // register-wise: same sparse table, row for row
    assert(merged.registers.exceptAll(mono.registers).isEmpty)
    assert(mono.registers.exceptAll(merged.registers).isEmpty)
    // and therefore the same estimate, bit for bit
    val em = Sketches.hllEstimate(merged).collect()(0).getDouble(0)
    val eo = Sketches.hllEstimate(mono).collect()(0).getDouble(0)
    assert(em == eo)
  }

  test("hllMerge: idempotent (self-merge is a no-op) and rejects mixed precisions") {
    val df = (1 to 300).map(i => s"key-$i").toDF("k")
    val sk = Sketches.hllRegisters(df, "k")
    val self = Sketches.hllMerge(Seq(sk, sk))
    assert(self.registers.exceptAll(sk.registers).isEmpty)
    assert(sk.registers.exceptAll(self.registers).isEmpty)
    val other = Sketches.hllRegisters(df, "k", p = 10)
    val e = intercept[IllegalArgumentException] {
      Sketches.hllMerge(Seq(sk, other))
    }
    assert(e.getMessage.contains("precision"))
  }

  test("hllDistinct: small-p tabulated alphas keep low-precision estimates in envelope") {
    // p in [4,6] uses the Flajolet per-m constants, not the asymptotic
    // formula; standard error at m=16 is ~26%, so bound loosely
    val df = (1 to 2000).map(i => s"key-$i").toDF("k")
    for ((p, bound) <- Seq(4 -> 0.8, 5 -> 0.6, 6 -> 0.5)) {
      val est = Sketches.hllDistinct(df, "k", p = p).collect()(0).getDouble(0)
      assert(math.abs(est - 2000) / 2000 < bound, s"p=$p est=$est")
    }
  }

  test("sampledMedian: equals the exact percentile-disc when input fits the cap") {
    val vals = Seq(9L, 1L, 7L, 3L, 5L, 11L, 2L).zipWithIndex
      .map { case (v, i) => (v, s"id$i") }
    val df = vals.toDF("v", "id")
    val got = Sketches.sampledMedian(df, col("v"), col("id"), cap = 100,
      as = "med").collect()(0).getLong(0)
    // 7 values sorted: 1 2 3 5 7 9 11 -> position (7+1) DIV 2 = 4 -> 5
    assert(got == 5L)
  }

  test("NULL keys are not values: hll estimates ignore them, bloom never contains them") {
    val mixed = (1 to 300).map(i => s"key-$i") ++ Seq.fill(50)(null.asInstanceOf[String])
    val clean = (1 to 300).map(i => s"key-$i")
    assert(
      Sketches.hllDistinct(mixed.toDF("k"), "k").collect()(0).getDouble(0) ==
        Sketches.hllDistinct(clean.toDF("k"), "k").collect()(0).getDouble(0))
    // all-null input: zero distinct values, estimate 0 (was ~1.0 when the
    // (null,null) register row counted as present)
    val allNull = Seq.fill(10)(null.asInstanceOf[String]).toDF("k")
    assert(Sketches.hllDistinct(allNull, "k").collect()(0).getDouble(0) == 0.0)
    // grouped: an all-null-key group still APPEARS, with estimate 0 —
    // the GROUP BY g + COUNT(DISTINCT k) contract (group has rows,
    // distinct count is 0); mixed groups ignore their nulls
    val g = Seq(("a", "x"), ("a", null), ("b", null)).toDF("g", "k")
    val byG = Sketches.hllDistinctByGroup(g, "g", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byG.keySet == Set("a", "b"))
    assert(byG("b") == 0.0)
    assert(byG("a") == Sketches.hllDistinct(Seq("x").toDF("k"), "k")
      .collect()(0).getDouble(0))
    // bloom: a null key neither crashes the probe densify nor matches;
    // a NULL probe key answers a definite false, never SQL NULL
    val f = Sketches.bloomBits(Seq("m1", null, "m2").toDF("k"), "k", 4, 1 << 12)
    val probe = Sketches.bloomMightContain(
      Seq("m1", "m2", "zz", null).toDF("k"), f, "k")
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    assert(probe(Some("m1")) && probe(Some("m2")) && !probe(Some("zz")))
    assert(!probe(None), "null probe key must be definite false")
    // count-min: null build keys materialize no unreachable cells
    val cm = Sketches.countMinCounters(
      Seq("a", null, "a").toDF("k"), "k", depth = 4, width = 256)
    assert(cm.counters.where(col("_b").isNull).count() == 0L)
  }

  test("hllDistinctByGroup: each group's estimate equals a dedicated global sketch over its rows") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"key-${i % 700}")).toDF("g", "k")
    val grouped = Sketches.hllDistinctByGroup(rows, "g", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(grouped.keySet == Set("g0", "g1", "g2"))
    for (g <- grouped.keys) {
      val solo = Sketches.hllDistinct(rows.where(col("g") === g), "k")
        .collect()(0).getDouble(0)
      assert(grouped(g) == solo, s"group $g: grouped=${grouped(g)} solo=$solo")
    }
    // and the envelope holds per group (distinct keys per group < 700)
    val truth = rows.groupBy("g").agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, est) <- grouped)
      assert(math.abs(est - truth(g)) / truth(g) < 0.15, s"$g est=$est true=${truth(g)}")
  }

  test("hllDistinctByGroups: composite-key estimates equal the dedicated global sketch per group") {
    // the q98 shape: a two-column group key; each (g, d) cell's estimate
    // must be bit-identical to a dedicated sketch over that cell's rows,
    // and the single-col form must be the one-element special case
    val rows = (1 to 4000)
      .map(i => (s"g${i % 2}", (i % 3).toLong, s"key-${i % 500}"))
      .toDF("g", "d", "k")
    val grouped = Sketches.hllDistinctByGroups(rows, Seq("g", "d"), "k")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(grouped.keySet.size == 6)
    for (((g, d), est) <- grouped) {
      val solo = Sketches.hllDistinct(
        rows.where(col("g") === g && col("d") === d), "k")
        .collect()(0).getDouble(0)
      assert(est == solo, s"($g,$d): grouped=$est solo=$solo")
    }
    val single = Sketches.hllDistinctByGroups(rows, Seq("g"), "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaOld = Sketches.hllDistinctByGroup(rows, "g", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(single == viaOld)
    intercept[IllegalArgumentException] {
      Sketches.hllDistinctByGroups(rows, Seq.empty, "k")
    }
  }

  test("countMinEstimate is row-preserving: duplicate probe rows each get an estimate") {
    import spark.implicits._
    val sketch = Sketches.countMinCounters(
      Seq("a", "a", "b").toDF("k"), "k", depth = 2, width = 64)
    val probes = Seq("a", "a", "b", "zz").toDF("k") // duplicate probe rows
    val est = Sketches.countMinEstimate(probes, sketch, "k")
    assert(est.count() == 4, "N probe rows in, N rows out — no silent merge")
    assert(est.columns.toSeq == Seq("k", "est_n"), "transient row id must not leak")
  }

  test("sampledMedian/sampledPercentileByGroup: NULL values are not observations; null tieKey cannot crowd the cap") {
    import spark.implicits._
    // null _c structs would sort FIRST in sort_array and shift the
    // percentile (or return null); the family rule filters them
    val rows = Seq(("g", null: java.lang.Long, "t1"), ("g", null: java.lang.Long, "t2"),
      ("g", java.lang.Long.valueOf(5L), "t3")).toDF("g", "v", "t")
    val med = Sketches.sampledMedianByGroup(rows, "g", col("v"), col("t"), cap = 10, "med")
      .collect()
    assert(med.length == 1 && med(0).getLong(1) == 5L,
      s"nulls are not observations: ${med.mkString}")
    val global = Sketches.sampledMedian(rows, col("v"), col("t"), cap = 10, "med")
      .collect()
    assert(global.length == 1 && global(0).getLong(0) == 5L)
    // numeric tieKeys now hash as their decimal string instead of
    // throwing (the hashUniform cast rule applied to md5)
    val numericTie = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L)).toDF("g", "v", "t")
    val m2 = Sketches.sampledMedianByGroup(numericTie, "g", col("v"), col("t"), cap = 10, "med")
      .collect()
    assert(m2.length == 1)
  }

  test("sampledPercentileByGroup: p25/p75 bracket the median; pct bounds enforced") {
    val rows = (1 to 300).map(i => ("g", (i % 100).toLong, s"id$i")).toDF("g", "v", "id")
    def pctOf(p: Double) = Sketches.sampledPercentileByGroup(
      rows, "g", col("v"), col("id"), cap = 1000, pct = p, as = "q")
      .collect()(0).getLong(1)
    val (p25, p50, p75) = (pctOf(0.25), pctOf(0.5), pctOf(0.75))
    assert(p25 <= p50 && p50 <= p75, s"$p25 / $p50 / $p75")
    // cap covers all rows -> exact percentile-disc of 0..99 (each x3)
    assert(p25 == 24L && p50 == 49L && p75 == 74L, s"$p25 / $p50 / $p75")
    intercept[IllegalArgumentException] { pctOf(0.0) }
  }

  test("sampledMedianByGroup: each group's median equals a dedicated global reservoir over its rows") {
    val rows = (1 to 900).map(i => (s"g${i % 3}", (i * 37 % 1000).toLong, s"id$i"))
      .toDF("g", "v", "id")
    val grouped = Sketches.sampledMedianByGroup(rows, "g", col("v"), col("id"),
      cap = 100, as = "med")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped.keySet == Set("g0", "g1", "g2"))
    for (g <- grouped.keys) {
      val solo = Sketches.sampledMedian(rows.where(col("g") === g),
        col("v"), col("id"), cap = 100, as = "med").collect()(0).getLong(0)
      assert(grouped(g) == solo, s"group $g: grouped=${grouped(g)} solo=$solo")
    }
  }

  test("countMinJoinSize: one-sided (est >= true join size), exact when collision-free, shape mismatch rejected") {
    // 50 keys on A (1 row each), 30 overlapping keys on B with 2 rows
    // each -> true join size = 30 * 1 * 2 = 60
    val a = (1 to 50).map(i => s"k$i").toDF("k")
    val b = (21 to 50).flatMap(i => Seq(s"k$i", s"k$i")).toDF("k")
    val sa = Sketches.countMinCounters(a, "k", depth = 4, width = 4096)
    val sb = Sketches.countMinCounters(b, "k", depth = 4, width = 4096)
    val est = Sketches.countMinJoinSize(sa, sb).collect()(0).getLong(0)
    assert(est >= 60L, s"one-sided guarantee violated: $est < 60")
    // at width 4096 with 50 keys, collisions are overwhelmingly absent
    assert(est == 60L, s"expected collision-free exactness, got $est")
    // disjoint key sets: inner product 0 (the spine row keeps min at 0)
    val c = Sketches.countMinCounters(
      (1 to 20).map(i => s"zz$i").toDF("k"), "k", depth = 4, width = 4096)
    assert(Sketches.countMinJoinSize(sa, c).collect()(0).getLong(0) == 0L)
    intercept[IllegalArgumentException] {
      Sketches.countMinJoinSize(sa,
        Sketches.countMinCounters(b, "k", depth = 4, width = 1024))
    }
  }

  test("bloom: no false negatives ever; false-positive rate within the analytic bound") {
    val members = (1 to 500).map(i => s"m$i")
    val f = Sketches.bloomBits(members.toDF("k"), "k",
      numHashes = 4, numBits = 1 << 14)
    assert(f.bits.count() <= (1L << 14))
    // every member passes — the Bloom law, unconditionally
    val memberPass = Sketches.bloomMightContain(members.toDF("k"), f, "k")
      .where(!col("might_contain")).count()
    assert(memberPass == 0L, s"$memberPass false negatives")
    // absent keys: fp rate ~ (1 - e^{-kn/m})^k = (1-e^{-4*500/16384})^4 ~ 1.7e-4
    val absent = (1 to 2000).map(i => s"zz$i")
    val fp = Sketches.bloomMightContain(absent.toDF("k"), f, "k")
      .where(col("might_contain")).count()
    assert(fp <= 20L, s"$fp false positives out of 2000 (expected ~0.3)")
  }

  test("bloomMerge law: union of partials is bit-identical to the monolithic filter") {
    val all = (1 to 600).map(i => s"key-$i")
    val (a, b) = all.splitAt(300)
    val merged = Sketches.bloomMerge(Seq(
      Sketches.bloomBits(a.toDF("k"), "k", 4, 1 << 12),
      Sketches.bloomBits(b.toDF("k"), "k", 4, 1 << 12)))
    val mono = Sketches.bloomBits(all.toDF("k"), "k", 4, 1 << 12)
    assert(merged.bits.except(mono.bits).isEmpty && mono.bits.except(merged.bits).isEmpty)
    // self-merge is a no-op; mixed shapes are inexpressible
    val selfm = Sketches.bloomMerge(Seq(mono, mono))
    assert(selfm.bits.count() == mono.bits.count())
    intercept[IllegalArgumentException] {
      Sketches.bloomMerge(Seq(mono, Sketches.bloomBits(a.toDF("k"), "k", 4, 1 << 13)))
    }
  }

  test("bloomMightContain plans as a narrow projection: no join, no shuffle") {
    val f = Sketches.bloomBits((1 to 100).map(i => s"m$i").toDF("k"), "k", 4, 1 << 12)
    val probe = Sketches.bloomMightContain(
      (1 to 100).map(i => s"p$i").toDF("k"), f, "k")
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe shuffles:\n$plan")
    assert(!plan.contains("Join"), s"probe joins:\n$plan")
  }

  test("logHist quantiles: one-sided < 2^-subBits relative error vs exact; bounded state") {
    // log-uniform-ish spread exercises many octaves; deterministic values
    val vals = (1 to 5000).map(i => (i.toLong * i * 31) % 1000000 + 1)
    val df = vals.toDF("v")
    val counts = Sketches.logHistCounts(df, col("v"), subBits = 4)
    // state bound: at most 64 octaves x 16 sub-buckets (+ the zero bucket)
    assert(counts.count() <= 64L * 16 + 1)
    val est = Sketches.logHistQuantiles(counts, Seq(500, 900, 990), subBits = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sorted = vals.sorted
    for ((p, (n, e)) <- est) {
      assert(n == vals.length.toLong)
      val rank = ((n * p + 999) / 1000).toInt // ceil(n*p/1000)
      val exact = sorted(rank - 1)
      assert(e <= exact, s"p$p: estimate $e above true $exact (must be one-sided)")
      assert((exact - e).toDouble / exact < 1.0 / 16,
        s"p$p: error ${(exact - e).toDouble / exact} exceeds 2^-4 (est=$e exact=$exact)")
    }
  }

  test("logHist: shard histograms merge by addition to exactly the whole-input sketch") {
    val (a, b) = (1 to 4000).map(i => (i.toLong * 2654435761L) % 500000 + 1).splitAt(1500)
    val whole = Sketches.logHistCounts((a ++ b).toDF("v"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Sketches.logHistMerge(Seq(
        Sketches.logHistCounts(a.toDF("v"), col("v")),
        Sketches.logHistCounts(b.toDF("v"), col("v"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == whole)
  }

  test("logHist grouped form: each group's quantiles equal a dedicated global sketch over its rows") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", (i.toLong * 48271) % 700000 + 1))
    val df = rows.toDF("g", "v")
    val grouped = Sketches.logHistQuantilesByGroups(
        Sketches.logHistCountsByGroups(df, Seq("g"), col("v")),
        Seq("g"), Seq(500, 990))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketches.hdrQuantiles(
          rows.filter(_._1 == g).map(_._2).toDF("v"), col("v"), Seq(500, 990))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      for (p <- Seq(500L, 990L))
        assert(grouped((g, p)) == solo(p), s"$g p$p: ${grouped((g, p))} != ${solo(p)}")
    }
  }

  test("logHist weighted: estimates bracket the exact weight-cumulative value, one-sided") {
    // value v carries weight v -> heavy tail: big values hold most weight,
    // so weighted quantiles sit far above row-count quantiles
    val rows = (1L to 1000L).map(v => (v, v))
    val est = Sketches.logHistQuantiles(
        Sketches.logHistWeightedCounts(rows.toDF("v", "w"), col("v"), col("w")),
        Seq(500, 990))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val totalW = rows.map(_._2).sum
    for ((p, (n, e)) <- est) {
      assert(n == totalW)
      val rank = (totalW * p + 999) / 1000
      val exact = rows.sortBy(_._1).iterator
        .scanLeft((0L, 0L)) { case ((_, cum), (v, w)) => (v, cum + w) }
        .find(_._2 >= rank).get._1
      assert(e <= exact, s"p$p: $e above exact $exact")
      assert((exact - e).toDouble / exact < 1.0 / 16,
        s"p$p: error exceeds 2^-4 (est=$e exact=$exact)")
    }
    // sanity: the byte-weighted median is far above the row median (~500)
    assert(est(500L)._2 > 600L, s"weighted median ${est(500L)._2} should exceed row median")
  }

  test("logHist: resolving with a mismatched subBits is rejected, not silently wrong") {
    val counts = Sketches.logHistCounts((1L to 100L).toDF("v"), col("v"), subBits = 5)
    intercept[IllegalArgumentException] {
      Sketches.logHistQuantiles(counts, Seq(500), subBits = 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.logHistQuantilesByGroups(
        Sketches.logHistCountsByGroups(
          (1L to 100L).map(("g", _)).toDF("g", "v"), Seq("g"), col("v"), subBits = 3),
        Seq("g"), Seq(500), subBits = 4)
    }
    // merge preserves the stamp: resolving a merged histogram still checks
    val merged = Sketches.logHistMerge(Seq(counts, counts))
    intercept[IllegalArgumentException] {
      Sketches.logHistQuantiles(merged, Seq(500), subBits = 4)
    }
    // merging mismatched ladders is itself rejected — unionByName would
    // succeed (identical schemas) and the FIRST stamp would survive,
    // which is exactly the silent wrong-quantile path
    val other = Sketches.logHistCounts((1L to 100L).toDF("v"), col("v"), subBits = 4)
    val ex = intercept[IllegalArgumentException] {
      Sketches.logHistMerge(Seq(counts, other))
    }
    assert(ex.getMessage.contains("subBits"), ex.getMessage)
  }

  test("logHist weighted: a negative weight fails the job instead of corrupting ranks; zero total weight latches the first bucket") {
    val bad = Seq((5L, 3L), (6L, -1L)).toDF("v", "w")
    val ex = intercept[Exception] {
      Sketches.logHistWeightedCounts(bad, col("v"), col("w")).collect()
    }
    assert(ex.getMessage.contains("negative weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative weight")),
      s"unexpected failure: ${ex.getMessage}")
    // all-zero weights: documented degenerate shape — n = 0, est = the
    // lowest observed bucket's lower bound (7 is below 2^subBits so its
    // bucket is exact), NOT the empty-input (0, 0) shape
    val zeros = Seq((7L, 0L), (100L, 0L)).toDF("v", "w")
    val q = Sketches.logHistQuantiles(
        Sketches.logHistWeightedCounts(zeros, col("v"), col("w")), Seq(500))
      .collect()(0)
    assert(q.getLong(1) == 0L && q.getLong(2) == 7L, q.toString)
  }

  test("logHist edge cases: exact powers of two land on exact estimates; zeros bucket; empty input") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // a bucket whose members are a single value estimates it exactly
    val pow = Seq.fill(100)(4096L) ++ Seq.fill(50)(0L)
    val q = Sketches.hdrQuantiles(pow.toDF("v"), col("v"), Seq(500, 999))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q(999) == 4096L, s"power-of-two bucket lower bound must be exact: $q")
    assert(q(500) == 4096L) // rank 75 of 150 sorted [0x50, 4096x100]
    val zeroHeavy = Sketches.hdrQuantiles(Seq.fill(10)(0L).toDF("v"), col("v"), Seq(500))
      .collect()(0)
    assert(zeroHeavy.getLong(1) == 10L && zeroHeavy.getLong(2) == 0L)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("v", LongType))))
    val e = Sketches.hdrQuantiles(empty, col("v"), Seq(500)).collect()(0)
    assert(e.getLong(1) == 0L && e.getLong(2) == 0L)
  }
}
