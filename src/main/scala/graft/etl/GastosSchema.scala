package graft.etl

import org.apache.spark.sql.types._

/** Explicit schema for the reference's one table (`gastos`, Brazilian
  * federal direct-spending records) — 28 fields as observed in every raw
  * API page and the bronze parquet footers (SURVEY.md §1.2; reference
  * proj-eng-dados/main.py:131 infers this by sampling, we declare it).
  *
  * Raw fidelity notes: `valor` arrives as decimal-as-text ("428.14") and
  * stays string through bronze; `data_pagamento` is an ISO date string;
  * `ano`/`mes` become hive partition columns from bronze on.
  */
object GastosSchema {

  val nomeColumns: Seq[String] = Seq(
    "nome_acao", "nome_elemento_despesa", "nome_favorecido", "nome_funcao",
    "nome_grupo_despesa", "nome_orgao", "nome_orgao_superior",
    "nome_programa", "nome_subfuncao", "nome_unidade_gestora")

  /** The 6 nome_* columns the reference uppercases+trims (main.py:215-226). */
  val normalizedNomeColumns: Seq[String] = Seq(
    "nome_orgao", "nome_favorecido", "nome_acao", "nome_programa",
    "nome_funcao", "nome_grupo_despesa")

  val codigoLongColumns: Seq[String] = Seq(
    "codigo_elemento_despesa", "codigo_funcao", "codigo_grupo_despesa",
    "codigo_orgao", "codigo_orgao_superior", "codigo_programa",
    "codigo_subfuncao", "codigo_unidade_gestora")

  /** Record schema as fetched (raw/bronze: valor + dates still strings). */
  val raw: StructType = StructType(
    Seq(
      StructField("ano", IntegerType),
      StructField("mes", IntegerType),
      StructField("codigo_acao", StringType),
      StructField("codigo_favorecido", StringType)) ++
      codigoLongColumns.map(StructField(_, LongType)) ++
      Seq(
        StructField("data_pagamento", StringType),
        StructField("data_pagamento_original", StringType),
        StructField("gestao_pagamento", StringType),
        StructField("linguagem_cidada", StringType)) ++
      nomeColumns.map(StructField(_, StringType)) ++
      Seq(
        StructField("numero_documento", StringType),
        StructField("valor", StringType)))

  /** API page envelope: {count, next, previous, results:[record]}
    * (main.py:74; FIXTURES.md §A.1). */
  def envelopeOf(record: StructType): StructType = StructType(Seq(
    StructField("count", LongType),
    StructField("next", StringType),
    StructField("previous", StringType),
    StructField("results", ArrayType(record))))

  val envelope: StructType = envelopeOf(raw)

  val partitionColumns: Seq[String] = Seq("ano", "mes")
}
