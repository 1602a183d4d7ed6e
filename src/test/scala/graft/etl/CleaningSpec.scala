package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row

/** C1–C5 semantics (SURVEY §2.3): each pandas-compat decision has a test. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("C2: coercing double cast fills unparseable and null with 0.0") {
    val df = Seq(("428.14"), ("abc"), (null: String)).toDF("valor")
    val got = Cleaning.coerceDoubleFillZero(df, "valor")
      .as[Double].collect().sorted
    assert(got.toSeq == Seq(0.0, 0.0, 428.14))
  }

  test("C1: strict cast applies when all values parse, keeps original otherwise") {
    val clean = Seq("2011", "2012").toDF("ano")
    val dirty = Seq("2011", "x").toDF("ano")
    assert(Cleaning.strictCastOrKeep(clean, "ano", "INT").schema("ano").dataType.typeName == "integer")
    // pandas astype(int) raises on 'x'; the reference catches and keeps the column
    assert(Cleaning.strictCastOrKeep(dirty, "ano", "INT").schema("ano").dataType.typeName == "string")
    // nulls don't count as failures (astype on object NaN is a separate
    // path; our contract: only non-null unparseables block the cast)
    val withNull = Seq("2011", null).toDF("ano")
    assert(Cleaning.strictCastOrKeep(withNull, "ano", "INT").schema("ano").dataType.typeName == "integer")
  }

  test("C3: normalizeText uppercases+trims unicode-aware and keeps nulls null") {
    val df = Seq("  educação física ", null).toDF("nome_orgao")
    val got = Cleaning.normalizeText(df, Seq("nome_orgao"))
      .as[String].collect()
    assert(got.contains("EDUCAÇÃO FÍSICA"))
    assert(got.contains(null)) // deliberate deviation from pandas' "NAN" artifact
  }

  test("C3/P3: columns not present are left untouched") {
    val df = Seq(1).toDF("other")
    assert(Cleaning.normalizeText(df, Seq("nome_orgao")).columns.toSeq == Seq("other"))
  }

  test("C4: coerceLong is coerce-to-null") {
    val df = Seq("7", "x", null).toDF("mes")
    val got = Cleaning.coerceLong(df, "mes").as[Option[Long]].collect()
    assert(got.count(_.isEmpty) == 2 && got.contains(Some(7L)))
  }

  test("C5: parseDate coerces ISO strings, null on garbage") {
    val df = Seq("2017-12-29", "not-a-date", null).toDF("data_pagamento")
    val got = Cleaning.parseDate(df, "data_pagamento").collect().map(_.get(0))
    assert(got.count(_ == null) == 2)
    assert(got.contains(java.sql.Date.valueOf("2017-12-29")))
  }

  test("silverClean applies the full reference order over the gastos shape") {
    val bronze = Seq(
      ("2011", "1", "  fundo nacional de saúde ", "ok", "428.14"),
      ("2011", "1", "agencia x", "ok", "bad")
    ).toDF("ano", "mes", "nome_orgao", "nome_favorecido", "valor")
    val got = Cleaning.silverClean(bronze)
    val rows = got.select("ano", "mes", "nome_orgao", "valor").collect().toSet
    assert(rows == Set(
      Row(2011L, 1L, "FUNDO NACIONAL DE SAÚDE", 428.14),
      Row(2011L, 1L, "AGENCIA X", 0.0)))
  }
}
