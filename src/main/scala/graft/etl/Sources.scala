package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Readers (SURVEY.md §2.1 S5/S6/S8).
  *
  * The reference loops json.load over a sorted glob and concatenates
  * page["results"] (main.py:109-124) — single-threaded, whole corpus in
  * RAM. Here each page file is a split of a distributed multiLine JSON
  * scan: union-all across pages is implicit, schema is declared (no
  * sampling pass), and malformed files degrade to null rows we drop —
  * the same per-file tolerance as the reference's try/except skip.
  */
object Sources {

  /** S5: envelope-form pages ({count,next,previous,results:[...]}).
    * One row per record via explode(results). */
  def readEnvelopeJson(spark: SparkSession, glob: String,
      record: StructType = GastosSchema.raw): DataFrame = {
    val env = new StructType()
      .add("count", "long").add("next", "string").add("previous", "string")
      .add("results", org.apache.spark.sql.types.ArrayType(record))
    spark.read.schema(env).option("multiLine", true).option("mode", "PERMISSIVE")
      .json(glob)
      .where(col("results").isNotNull) // bare-array/corrupt files -> all-null row
      .select(explode(col("results")).as("r"))
      .select(col("r.*"))
  }

  /** S5 variant: legacy bare-array pages ([{...}, ...]) — 55 of the
    * reference's 1021 committed files; its loader silently skips them
    * (main.py:119), this reads them. Spark's multiLine JSON reader
    * yields one row per array element when given the record schema. */
  def readBareArrayJson(spark: SparkSession, glob: String,
      record: StructType = GastosSchema.raw): DataFrame =
    spark.read.schema(record).option("multiLine", true).option("mode", "PERMISSIVE")
      .json(glob)
      .where(GastosSchema.partitionColumns.map(col(_).isNotNull).reduce(_ || _))

  /** Both page forms, unioned by name. */
  def readRawPages(spark: SparkSession, glob: String,
      tolerateBareArrays: Boolean = true): DataFrame = {
    val env = readEnvelopeJson(spark, glob)
    if (tolerateBareArrays) env.unionByName(readBareArrayJson(spark, glob))
    else env
  }

  /** S8/S9: partitioned parquet scan with hive partition discovery —
    * Spark does natively what pd.read_parquet / pyarrow ds.dataset do in
    * the reference (main.py:198, 283-286). */
  def readParquetLayer(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
