package graft.ops

/** Corpus-adaptive dials for the bucket/posting caps that bound every
  * quadratic candidate regime in the dedup/ANN/graph families. The
  * fixed defaults (10 000-member LSH buckets, 100 000-posting grams,
  * degree-64 wedge centers) were hand-guessed once and correct at the
  * test scales, but a constant either pinches recall as the corpus
  * grows (it engages on ever-more buckets) or stops protecting cost
  * (if set high). The √n rule removes the guess:
  *
  *   cap(n) = clamp(lo, hi, mult · ceil(√n))
  *
  * Why √n: an in-bucket (or in-posting-list) join costs ≤ cap² pairs,
  * so cap = c·√n bounds any single bucket's pair formation at c²·n —
  * never worse than a constant number of full corpus scans — while the
  * cap still GROWS with the corpus, so the fraction of buckets it
  * engages on (and the recall it costs, all audited by the overflow
  * companions) shrinks instead of growing as n rises. The same shape
  * as d48's ceil(√n) IVF cell count; derived, not guessed.
  *
  * Portability (the autoLists precedent, Similarity.scala): IEEE-754
  * requires sqrt to be CORRECTLY ROUNDED — unlike log/exp it is
  * bit-identical across platforms — and n ≤ 2⁵³ is exact as a double,
  * so `CEIL(SQRT(CAST(n AS DOUBLE)))` in DuckDB reproduces
  * `math.ceil(math.sqrt(n.toDouble))` exactly and an oracle re-derives
  * the cap from the same COUNT(*). Every auto front door built on this
  * keeps its fixed-cap sibling's oracle SHAPE; only the cap literal
  * becomes a replayed subquery (the q102/g06 auto-dial contract:
  * the dial derivation is part of the checked answer).
  */
object Dials {

  /** clamp(lo, hi, mult·ceil(√n)) in exact double-sqrt arithmetic. */
  def sqrtCap(n: Long, mult: Int, lo: Int, hi: Int): Int = {
    require(n >= 0 && n <= (1L << 53), s"n out of exact-double range: $n")
    require(mult >= 1 && lo >= 1 && hi >= lo,
      s"need mult >= 1 and 1 <= lo <= hi, got mult=$mult lo=$lo hi=$hi")
    val raw = mult.toLong * math.ceil(math.sqrt(n.toDouble)).toLong
    math.max(lo.toLong, math.min(hi.toLong, raw)).toInt
  }

  /** LSH bucket-membership cap from corpus row count: 16·ceil(√n) in
    * [256, 1e6]. Shared by the minhash band buckets (d03) and the SRP
    * (table, code) buckets (d07/d08) — same quadratic regime, same
    * bound. The DuckDB replay:
    * `GREATEST(256, LEAST(1000000, 16 * CAST(ceil(sqrt(CAST(n AS DOUBLE))) AS BIGINT)))`. */
  def autoBucketCap(n: Long): Int = sqrtCap(n, mult = 16, lo = 256, hi = 1000000)

  /** Prefix-filter posting-list cap from corpus doc count: 4·ceil(√n)
    * in [64, 1e6]. Tighter multiplier than the bucket cap because a
    * prefix gram's postings join is the ONLY cost bound d70 has (no
    * band amplification dilutes it). */
  def autoMaxPostings(n: Long): Int = sqrtCap(n, mult = 4, lo = 64, hi = 1000000)

  // NOTE deliberately absent: a √-rule for g09's wedge-center degree
  // cap. √n is the right bound when the cap limits ONE bucket's
  // in-bucket join (cost cap² ≤ c²·n, and buckets are many) — but the
  // center cap bounds the TOTAL wedge mass Σ_{deg ≤ cap} deg², where a
  // √(2m) cap yields (2m)^1.5 total work (measured: non-binding on the
  // narrow-degree co-purchase graph, admitting ~all nodes). That dial
  // lives in Graph.autoCenterDegree as a wedge-BUDGET rule instead:
  // the largest cap whose total wedge mass stays within k edge-list
  // units — contractually linear at any scale.
}
