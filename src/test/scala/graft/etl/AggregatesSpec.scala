package graft.etl

import graft.SparkSpec

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private val silver = Seq(
    (2011, 1, "A", 10.0), (2011, 1, "A", 5.5), (2011, 1, "B", 1.0),
    (2011, 2, "A", 2.0)
  ).toDF("ano", "mes", "nome_orgao", "valor")

  test("A1 goldAggregate groups by (ano, mes, key) and sums to total_gasto") {
    val got = Aggregates.goldAggregate(silver)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    assert(got == Set((2011, 1, "A", 15.5), (2011, 1, "B", 1.0), (2011, 2, "A", 2.0)))
  }

  test("A1 keeps null group keys (SQL semantics; documented pandas deviation)") {
    val withNull = silver.union(Seq((2011, 3, null: String, 9.0))
      .toDF("ano", "mes", "nome_orgao", "valor"))
    val got = Aggregates.goldAggregate(withNull)
    assert(got.where("nome_orgao IS NULL").count() == 1)
  }

  test("A2–A5 summarize computes the EDA report in one pass") {
    val df = Seq(
      ("A", "2011-01-05", 10.0), ("B", "2011-03-20", 20.0), ("A", "2011-02-10", 30.007)
    ).toDF("nome_orgao", "data_pagamento", "valor")
    val r = Aggregates.summarize(df).collect()(0)
    assert(r.getLong(0) == 3)                     // n_rows
    assert(r.getLong(1) == 2)                     // distinct orgaos
    assert(r.getString(2) == "2011-01-05")        // min date
    assert(r.getString(3) == "2011-03-20")        // max date
    assert(r.getDouble(4) == 20.0)                // round(mean, 2) = round(20.002..., 2)
  }
}
