package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The native expressions must be bit-compatible with the pure-builtin
  * lambda formulations they replace, in both interpreted and codegen'd
  * evaluation. */
class TextHashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs and more text for shingles"),
    (3L, "hi"),              // shorter than shingle n -> empty grams
    (4L, ""),
    (5L, "你好 世界 你好 世界 再见 你好")
  ).toDF("doc_id", "text")

  test("native xxh minhash == composed minhash, lane for lane") {
    val native = Dedup.signaturesXxh(docs, "doc_id", "text", shingleN = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = Dedup.signaturesComposed(docs, "doc_id", "text", shingleN = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == composed.keySet)
    native.keySet.foreach(k => assert(native(k) == composed(k), s"doc $k"))
    assert(native(3L).forall(_ == Long.MaxValue)) // empty-grams sentinel preserved
  }

  test("native xxh simhash == composed simhash") {
    val native = Dedup.simhashesXxh(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simhashesComposed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed)
  }

  // independent reference implementation of the md5 chain (MessageDigest
  // + explicit little-endian reads) — NOT the production code path
  private def refHalves(s: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def le(off: Int) = (7 to 0 by -1).foldLeft(0L)((v, k) => (v << 8) | (d(off + k) & 0xFFL))
    (le(0), le(8))
  }

  test("md5 halves equal DuckDB md5_number_upper/lower bit for bit") {
    // DuckDB 1.0.0: SELECT md5_number_upper('abc'), md5_number_lower('abc')
    //   -> (12704604231530709392, 8250560606382298838)  [UBIGINT]
    val (h1, h2) = refHalves("abc")
    assert(h1 == java.lang.Long.parseUnsignedLong("12704604231530709392"))
    assert(h2 == 8250560606382298838L)
    val viaExpr = Md5Mix.halves(org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    assert(viaExpr(0) == h1 && viaExpr(1) == h2)
  }

  test("portable md5 minhash/simhash match the reference chain (codegen path)") {
    val grams = Seq("the quick brown", "quick brown fox", "你好 世界 再见")
    val k = 8
    val expectedSig = (0 until k).map { i =>
      grams.map { g => val (h1, h2) = refHalves(g); h1 + i * h2 }.min
    }
    val expectedFp = {
      val counters = new Array[Int](64)
      for (t <- Seq("alpha", "beta", "gamma", "beta"); i <- 0 until 64)
        counters(i) += (if (((refHalves(t)._1 >>> i) & 1L) == 1L) 1 else -1)
      (0 until 64).foldLeft(0L)((fp, i) => if (counters(i) > 0) fp | (1L << i) else fp)
    }
    val got = Seq((grams.toArray, Array("alpha", "beta", "gamma", "beta")))
      .toDF("grams", "toks")
      .select(
        TextHashExpressions.minhashMd5(col("grams"), k).as("sig"),
        TextHashExpressions.simhashMd5(col("toks")).as("fp"))
      .collect()(0)
    assert(got.getSeq[Long](0) == expectedSig)
    assert(got.getLong(1) == expectedFp)
    // empty grams keep the sentinel convention
    val sentinel = Seq(Tuple1(Array.empty[String])).toDF("grams")
      .select(TextHashExpressions.minhashMd5(col("grams"), 4).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(sentinel.forall(_ == Long.MaxValue))
  }

  test("expressions work through SQL after registration and survive codegen") {
    TextHashExpressions.register(spark)
    docs.createOrReplaceTempView("thx_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash(split(text, ' '), 8) AS sig,
        |       graft_simhash(split(text, ' ')) AS fp
        |FROM thx_docs""".stripMargin)
    val rows = viaSql.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getSeq[Long](1).length == 8))
    // null input -> null out (UnaryExpression null propagation)
    val nullRow = spark.sql("SELECT graft_simhash(CAST(NULL AS ARRAY<STRING>))").collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("native shingles == composed shingles (content, order, distinctness)") {
    val native = Dedup.withShingles(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val composed = Dedup.withShinglesComposed(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == composed)
    assert(native(3L).isEmpty) // "hi" shorter than n
    assert(native(1L).contains("the quick brown"))
  }

  test("native signature agreement == composed estJaccard") {
    TextHashExpressions.register(spark)
    val sigs = Seq(
      (1L, Array(1L, 2L, 3L, 4L), Array(1L, 2L, 3L, 4L)),  // all agree
      (2L, Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 9L)),  // half agree
      (3L, Array(1L, 2L, 3L, 4L), Array(9L, 9L, 9L, 9L))   // none agree
    ).toDF("id", "a", "b")
    val got = sigs.select(col("id"),
        Dedup.estJaccard(col("a"), col("b"), 4).as("native"),
        Dedup.estJaccardComposed(col("a"), col("b"), 4).as("composed"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    got.foreach { case (id, n, c) => assert(n == c, s"id $id") }
    assert(got.map(_._2).toSeq == Seq(1.0, 0.5, 0.0))
  }

  test("native dot product == composed dot product, including edge cases") {
    TextHashExpressions.register(spark)
    val vecs = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.0, 0.0), Array(0.0, 0.0)),
      (3L, Array(-1.5, 2.5), Array(3.0, -4.0))
    ).toDF("id", "a", "b")
    val got = vecs.select(col("id"),
        call_function("graft_dot", col("a"), col("b")).as("native"),
        graft.ops.Similarity.dotComposed(col("a"), col("b")).as("composed"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    got.foreach { case (id, n, c) => assert(n == c, s"id $id") }
    assert(got.find(_._1 == 1L).get._2 == 32.0)
  }

  test("shingles treat null tokens like concat_ws (skipped, no phantom separator)") {
    TextHashExpressions.register(spark)
    val got = spark.sql(
      "SELECT graft_shingles(array('a', CAST(NULL AS STRING), 'b'), 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a b")) // null skipped, single separator — concat_ws semantics
  }

  test("typed builders work in a fresh session with no registration") {
    val s2 = spark.newSession()
    import s2.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val r = df.select(
      graft.ops.Similarity.dot(col("a"), col("b")).as("d"),
      graft.ops.Similarity.cosine(col("a"), col("b")).as("c")).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 11.0 / (math.sqrt(5) * math.sqrt(25))) < 1e-12)
  }

  test("registration is per-session and idempotent") {
    val s2 = spark.newSession()
    TextHashExpressions.register(s2)
    TextHashExpressions.register(s2) // second call must not throw
    assert(s2.sql("SELECT graft_simhash(array('a','b'))").collect()(0).getLong(0) ==
      spark.sql("SELECT graft_simhash(array('a','b'))").collect()(0).getLong(0))
  }
}
