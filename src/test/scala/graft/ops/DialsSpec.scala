package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-arithmetic spec for the √n cap dials — no SparkSession. The
  * DuckDB-side replay (GREATEST/LEAST/ceil/sqrt) is certified by the
  * d78/d79/d80/g24 oracle rows; here we pin the Scala side's exactness
  * against a BigInt integer square root, the clamps, and the guards. */
class DialsSpec extends AnyFunSuite {

  /** Exact ceil(√n) by integer Newton — the reference the double-sqrt
    * implementation must match everywhere in the exact-double range. */
  private def ceilIsqrt(n: Long): Long = {
    if (n <= 0) return 0
    var x = BigInt(java.math.BigInteger.valueOf(n).sqrt()) // floor sqrt, exact
    if (x * x < n) x += 1
    x.toLong
  }

  test("sqrtCap equals mult*ceil(isqrt(n)) within clamps across magnitudes") {
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 5L, 255L, 256L, 257L, 6000L, 59999L,
      60000L, 1000000L, 999966000289L, (1L << 53) - 1, 1L << 53) ++
      (0 to 50).map(i => (1L << (i % 53)) + i)
    for (n <- ns) {
      val got = Dials.sqrtCap(n, mult = 4, lo = 64, hi = 1000000)
      val want = math.max(64L, math.min(1000000L, 4L * ceilIsqrt(n))).toInt
      assert(got == want, s"n=$n")
    }
  }

  test("perfect squares and off-by-one neighbors round exactly") {
    // r bounded by 2^26: above it, sqrt(r^2 + 1) lies within half an ulp
    // of r and correctly ROUNDS DOWN to exactly r, so ceil(double-sqrt)
    // is one below the mathematical ceiling. That is fine for the
    // contract — BOTH engines compute the same correctly-rounded double
    // sqrt, so they agree with each other (the portability claim) —
    // but it means the exact-ceiling property only holds for r <= 2^26,
    // i.e. n <= 2^52, which every real corpus count satisfies.
    for (r <- Seq(1L, 7L, 100L, 77777L, 1L << 25)) {
      val sq = r * r
      assert(Dials.sqrtCap(sq, 1, 1, Int.MaxValue) == r)
      assert(Dials.sqrtCap(sq - 1, 1, 1, Int.MaxValue) == r)     // ceil
      assert(Dials.sqrtCap(sq + 1, 1, 1, Int.MaxValue) == r + 1)
    }
  }

  test("autoMaxPostings: clamps engage at the documented corners") {
    assert(Dials.autoMaxPostings(0L) == 64)            // lo clamp
    assert(Dials.autoMaxPostings(100L) == 64)          // 4*10=40 -> lo
    assert(Dials.autoMaxPostings(6000L) == 4 * 78)     // ceil(sqrt(6000))=78
    assert(Dials.autoMaxPostings(1L << 53) == 1000000) // hi clamp
  }

  test("autoBucketCap: matches 16*ceil(sqrt(n)) in [256, 1e6]") {
    assert(Dials.autoBucketCap(0L) == 256)
    assert(Dials.autoBucketCap(6000L) == 16 * 78)
    assert(Dials.autoBucketCap(60000L) == 16 * 245)
    assert(Dials.autoBucketCap(1L << 53) == 1000000)
  }

  test("guards reject out-of-range inputs") {
    intercept[IllegalArgumentException](Dials.sqrtCap(-1L, 1, 1, 2))
    intercept[IllegalArgumentException](Dials.sqrtCap((1L << 53) + 1, 1, 1, 2))
    intercept[IllegalArgumentException](Dials.sqrtCap(10L, 0, 1, 2))
    intercept[IllegalArgumentException](Dials.sqrtCap(10L, 1, 5, 2))
  }
}
