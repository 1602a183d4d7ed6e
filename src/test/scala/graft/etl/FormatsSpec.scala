package graft.etl

import graft.SparkSpec

/** SURVEY §2.1 "other formats/connectors — engine gets them free via
  * spark.read.format": proven, not just claimed. CSV, ORC, and JSON
  * lines round-trip through the same DataFrame surface every operator
  * consumes. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "a", 1.5), (2L, "b", -2.25), (3L, null: String, 0.0))
    .toDF("k", "s", "v")

  test("csv round-trip with header + explicit schema") {
    val path = tmpDir("fmt") + "/csv"
    df.write.option("header", true).csv(path)
    val back = spark.read.option("header", true)
      .schema("k LONG, s STRING, v DOUBLE").csv(path)
    assert(back.collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet ==
      df.collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet)
  }

  test("orc round-trip preserves schema") {
    val path = tmpDir("fmt") + "/orc"
    df.write.orc(path)
    val back = spark.read.orc(path)
    // nullability widens on file read-back; names and types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 3)
  }

  test("json-lines round-trip with explicit schema") {
    val path = tmpDir("fmt") + "/jsonl"
    df.write.json(path)
    val back = spark.read.schema("k LONG, s STRING, v DOUBLE").json(path)
    assert(back.collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet ==
      df.collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet)
  }
}
