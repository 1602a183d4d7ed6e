package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val r = tmpDir(s"mlog-$tag")
    ManifestTable.drop(spark, r)
    r
  }

  test("append accumulates, overwrite replaces, reads see exact snapshots") {
    val root = freshRoot("basic")
    val v1 = ManifestTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root, "overwrite")
    val v2 = ManifestTable.commit(Seq((3L, "c")).toDF("id", "s"), root, "append")
    val v3 = ManifestTable.commit(Seq((9L, "z")).toDF("id", "s"), root, "overwrite")
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(ManifestTable.read(spark, root, Some(1L)).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(ManifestTable.read(spark, root, Some(2L)).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // latest = the overwrite: old files excluded though still on disk
    assert(ManifestTable.read(spark, root).select("id")
      .as[Long].collect().toSeq == Seq(9L))
    // time travel is immutable after later commits
    assert(ManifestTable.read(spark, root, Some(2L)).count() == 3L)
    assert(ManifestTable.history(spark, root).map(h => (h._1, h._2, h._3)) ==
      Seq((1L, "overwrite", 2L), (2L, "append", 1L), (3L, "overwrite", 1L)))
  }

  test("a crashed commit (staged data, no manifest) is invisible to readers") {
    val root = freshRoot("crash")
    ManifestTable.commit(Seq((1L, "a")).toDF("id", "s"), root, "overwrite")
    // simulate a writer that died after staging data files but before
    // the manifest rename: files land under data/, no manifest names them
    Seq((99L, "ghost")).toDF("id", "s").write
      .parquet(s"$root/data/orphan-commit")
    assert(ManifestTable.versions(spark, root) == Seq(1L))
    assert(ManifestTable.read(spark, root).select("id")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("a lost manifest race throws and leaves the committed snapshot intact") {
    val root = freshRoot("race")
    ManifestTable.commit(Seq((1L, "a")).toDF("id", "s"), root, "overwrite")
    // occupy the NEXT version's target name with something versions()
    // does not count as a commit (a directory — debris, not a manifest
    // file), so the committer resolves v2 and then finds its commit
    // point taken: the exists/rename guard must throw, exactly as it
    // would when a concurrent writer's rename landed first
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_manifests/v000002.manifest"))
    val ex = intercept[IllegalStateException] {
      ManifestTable.commit(Seq((2L, "b")).toDF("id", "s"), root, "append")
    }
    assert(ex.getMessage.contains("race"))
    // v1 still reads exactly as committed
    assert(ManifestTable.read(spark, root, Some(1L)).count() == 1L)
    assert(ManifestTable.versions(spark, root) == Seq(1L))
  }

  test("reading an uncommitted version or an empty root fails loudly") {
    val root = freshRoot("guards")
    intercept[IllegalArgumentException](ManifestTable.read(spark, root))
    ManifestTable.commit(Seq((1L, "a")).toDF("id", "s"), root, "overwrite")
    intercept[IllegalArgumentException](
      ManifestTable.read(spark, root, Some(7L)))
  }
}
