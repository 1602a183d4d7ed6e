package graft

import graft.etl.{Cleaning, Quality}
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2): results must be independent
  * of physical layout (partitioning), the quality gate must agree with
  * row-level counting, and coercing casts must round-trip clean values.
  * Generators are driven directly with fixed seeds (scalatest+scalacheck
  * without the scalatestplus bridge, which isn't in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("integer-cents aggregation total is invariant under repartitioning") {
    val gen = for {
      xs <- Gen.listOfN(60, Gen.chooseNum(-1000000L, 1000000L))
      parts <- Gen.chooseNum(1, 8)
    } yield (xs, parts)
    samples(gen, 8).foreach { case (xs, parts) =>
      val df = xs.map(x => (x % 5, x.toDouble / 100)).toDF("k", "v")
      val direct = df.agg(Exact.centsSum(col("v"))).collect()(0).getLong(0)
      val repart = df.repartition(parts).agg(Exact.centsSum(col("v"))).collect()(0).getLong(0)
      assert(direct == repart)
      assert(direct == xs.sum) // cents of x/100 recover x exactly
    }
  }

  test("quality gate passes iff zero violating rows exist") {
    samples(Gen.listOfN(30, Gen.chooseNum(-2, 14)), 8).foreach { ms =>
      val df = ms.map(m => Tuple1(m)).toDF("mes")
      val checks = Seq(Quality.InRange("mes", 1, 12))
      val violations = ms.count(m => m < 1 || m > 12)
      val gateResult = scala.util.Try(Quality.runGate(df, checks))
      assert(gateResult.isSuccess == (violations == 0))
      assert(Quality.measure(df, checks)("in_range(mes,1.0,12.0)") == violations.toLong)
    }
  }

  test("coercing double cast round-trips clean decimal strings and zeroes garbage") {
    val cleanGen = Gen.listOfN(20, Gen.chooseNum(-99999L, 99999L))
    samples(cleanGen, 8).foreach { cents =>
      // Locale.ROOT: the f-interpolator would emit comma decimals on
      // pt_BR/de_DE machines and break the round-trip
      val df = cents.map(c => String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(c / 100.0))).toDF("valor")
      val got = Cleaning.coerceDoubleFillZero(df, "valor").as[Double].collect()
      assert(got.toSet == cents.map(_ / 100.0).toSet)
    }
    val garbage = Seq("x", "", "1.2.3", null).toDF("valor")
    assert(Cleaning.coerceDoubleFillZero(garbage, "valor").as[Double].collect().forall(_ == 0.0))
  }

  test("minhash estimated Jaccard is 1 for identical docs and in [0,1] always") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    samples(Gen.listOfN(4, docGen), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val dup = docs.union(docs.limit(1).withColumn("doc_id", lit(999L)))
      val pairs = Dedup.minhashCandidates(dup, "doc_id", "text",
        shingleN = 2, numHashes = 8, bands = 4)
      val rows = pairs.collect()
      rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
      // the planted exact duplicate must be found with est 1.0
      val planted = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 999L)
      assert(planted.exists(_.getDouble(2) == 1.0))
    }
  }
}
