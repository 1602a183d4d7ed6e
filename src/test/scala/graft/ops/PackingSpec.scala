package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 120).map { i =>
    val words = 3 + (i * 7) % 40 // 3..42 tokens
    (i.toLong, Seq.fill(words)(s"w$i").mkString(" "), if (i % 3 == 0) "a" else "b")
  }.toDF("doc_id", "text", "lang")

  test("chunkByTokens: overlapping chunks cover every token, last chunk short") {
    val one = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val got = Packing.chunkByTokens(one, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_text")))
    assert(got.toSeq == Seq(
      (0L, 4L, "t0 t1 t2 t3"),
      (1L, 4L, "t3 t4 t5 t6"),
      (2L, 4L, "t6 t7 t8 t9"),
      (3L, 1L, "t9")))
    // a stride that would skip tokens is rejected loudly
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(one, "doc_id", "text", chunkSize = 4, stride = 5)
    }
  }

  test("packByOffset keeps null-stratum rows as their own group") {
    val withNulls = docs.withColumn("lang",
      when(col("doc_id") % 5 === 0, lit(null: String)).otherwise(col("lang")))
    val packed = Packing.packByOffset(withNulls, "doc_id", "text", "lang", budgetTokens = 100)
    assert(packed.count() == 120)                         // nothing dropped
    val nullBins = packed.where(col("lang").isNull).select("bin_id")
      .collect().map(_.getLong(0)).distinct.sorted
    assert(nullBins.nonEmpty && nullBins.head == 0L)       // binned from offset 0
  }

  test("packByOffset keeps null-TEXT rows as zero-token documents") {
    // hashUniform(NULL) is NULL — before the coalesces, null-text rows
    // got a null bucket and the offset join dropped them silently
    val withNulls = docs.withColumn("text",
      when(col("doc_id") % 7 === 0, lit(null: String)).otherwise(col("text")))
    val packed = Packing.packByOffset(withNulls, "doc_id", "text", "lang", budgetTokens = 100)
    assert(packed.count() == 120, "null-text rows must not be dropped")
    val nullRows = packed.join(withNulls.where(col("text").isNull).select("doc_id"), "doc_id")
    assert(nullRows.count() > 0)
    assert(nullRows.where(col("n_tokens") =!= 0).count() == 0,
      "null text is a zero-token document")
    // offsets still contiguous: total tokens unchanged by the null rows
    val total = packed.agg(sum(col("n_tokens"))).head.getLong(0)
    val expected = withNulls.where(col("text").isNotNull)
      .select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(total == expected)
  }

  test("bins start at 0 per stratum and cover contiguous token offsets") {
    val packed = Packing.packByOffset(docs, "doc_id", "text", "lang", budgetTokens = 100)
    val byStratum = packed.collect()
      .groupBy(_.getString(1))
      .map { case (s, rows) => s -> rows.map(_.getLong(3)).distinct.sorted.toSeq }
    byStratum.values.foreach { bins =>
      assert(bins.head == 0L)
      assert(bins == (bins.head to bins.last)) // no gaps
    }
  }

  test("every bin's token total stays within budget + one max doc (offset property)") {
    val budget = 100L
    val packed = Packing.packByOffset(docs, "doc_id", "text", "lang", budget)
    val maxDoc = 42L
    val totals = packed.groupBy("lang", "bin_id").agg(sum("n_tokens").as("t"))
      .collect().map(_.getAs[Long]("t"))
    assert(totals.forall(_ <= budget + maxDoc))
    // and packing is dense: every non-final bin holds more than budget - maxDoc
    val perStratum = packed.collect().groupBy(r => (r.getString(1)))
    perStratum.foreach { case (_, rows) =>
      val byBin = rows.groupBy(_.getLong(3)).map { case (b, rs) => b -> rs.map(_.getLong(2)).sum }
      val last = byBin.keys.max
      byBin.filter(_._1 != last).values.foreach(t => assert(t > budget - maxDoc))
    }
  }

  test("packing is deterministic under repartitioning") {
    val a = Packing.packByOffset(docs, "doc_id", "text", "lang", 100)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = Packing.packByOffset(docs.repartition(13), "doc_id", "text", "lang", 100)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(a == b)
  }
}
