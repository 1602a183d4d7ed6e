package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Query-level checks for the scalar-family additions: the typed JSON
  * parse path (q44) against the string-extraction path, and the
  * higher-order array reductions (q45) against a driver-side
  * recomputation over the same quantized arrays. Cross-engine value
  * agreement is the oracle's job; these pin the operator logic.
  */
class ExtendedQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q44: from_json typed parse agrees with get_json_object extraction") {
    val typed = ExtendedQueries.q44JsonFuncs.run(spark, dir)
    val strings = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(get_json_object(props, '$.k') AS LONG)").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"),
        count(col("k")).as("n_k"),
        count(lit(1)).as("n"))
    assert(typed.exceptAll(strings).isEmpty)
    assert(strings.exceptAll(typed).isEmpty)
  }

  test("q45: array reductions match a driver-side recomputation per row") {
    val qe = transform(col("embedding"), x => round(x.cast("double") * 1000, 0).cast("long"))
    val rows = ExtendedQueries.q45ArrayHof.run(spark, dir)
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), qe.as("e")), "vec_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getSeq[Long](r.fieldIndex("e"))
      assert(r.getAs[Long]("n_dims") == e.length.toLong)
      assert(r.getAs[Long]("qnorm2") == e.map(v => v * v).sum)
      assert(r.getAs[Long]("qmax") == e.max)
      assert(r.getAs[Long]("n_pos") == e.count(_ > 0).toLong)
    }
  }
}
