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

  test("file stats prune the plan; stat-less files are conservatively kept") {
    val root = freshRoot("prune")
    // one file per commit, disjoint id ranges -> min/max per file
    ManifestTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1),
      root, "overwrite", statsCol = Some("id"))
    ManifestTable.commit(Seq((10L, "c"), (12L, "d")).toDF("id", "s").coalesce(1),
      root, "append", statsCol = Some("id"))
    ManifestTable.commit(Seq((20L, "e")).toDF("id", "s").coalesce(1),
      root, "append", statsCol = Some("id"))
    val pr = ManifestTable.readPruned(spark, root, 9L, 13L)
    assert((pr.filesKept, pr.filesTotal) == (1L, 3L))
    assert(pr.df.select("id").as[Long].collect().sorted.toSeq == Seq(10L, 12L))
    // boundary intersection: [2,10] touches files 1 and 2
    val pr2 = ManifestTable.readPruned(spark, root, 2L, 10L)
    assert((pr2.filesKept, pr2.filesTotal) == (2L, 3L))
    // an append WITHOUT stats is never pruned out
    ManifestTable.commit(Seq((99L, "z")).toDF("id", "s").coalesce(1), root, "append")
    val pr3 = ManifestTable.readPruned(spark, root, 9L, 13L)
    assert((pr3.filesKept, pr3.filesTotal) == (2L, 4L))
    assert(pr3.df.select("id").as[Long].collect().sorted.toSeq == Seq(10L, 12L, 99L))
  }

  test("equality deletes are merge-on-read, accumulate, and time-travel away") {
    val root = freshRoot("del")
    ManifestTable.commit((1L to 6L).toDF("id"), root, "overwrite")
    val v2 = ManifestTable.delete(spark, root, Seq(2L, 4L).toDF("id"), "id")
    assert(v2 == 2L)
    assert(ManifestTable.read(spark, root).as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L, 6L))
    // v1 still sees everything (delete touched no data file)
    assert(ManifestTable.read(spark, root, Some(1L)).count() == 6L)
    // deletes accumulate; appends carry the delete set forward
    ManifestTable.delete(spark, root, Seq(6L).toDF("id"), "id")
    ManifestTable.commit(Seq(7L).toDF("id"), root, "append")
    assert(ManifestTable.read(spark, root).as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L))
    // a mismatched delete key is rejected
    intercept[IllegalArgumentException](
      ManifestTable.delete(spark, root, Seq(1L).toDF("x"), "x"))
    // overwrite clears the delete set
    ManifestTable.commit(Seq(2L).toDF("id"), root, "overwrite")
    assert(ManifestTable.read(spark, root).as[Long].collect().toSeq == Seq(2L))
  }

  test("compact materializes deletes into few files; history still time-travels") {
    val root = freshRoot("compact")
    (1L to 4L).foreach(i => ManifestTable.commit(
      Seq((i, s"s$i")).toDF("id", "s").coalesce(1), root,
      if (i == 1L) "overwrite" else "append"))
    ManifestTable.delete(spark, root, Seq(3L).toDF("id"), "id")
    val v = ManifestTable.compact(spark, root, nFiles = 2)
    assert(v == 6L)
    val h = ManifestTable.history(spark, root).last
    assert((h._2, h._3, h._4, h._5) == ("compact", 3L, 2L, 0L))
    assert(ManifestTable.read(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    // pre-compact snapshot (with its merge-on-read delete) is intact
    assert(ManifestTable.read(spark, root, Some(5L)).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    assert(ManifestTable.read(spark, root, Some(4L)).count() == 4L)
  }

  test("vacuum deletes unreferenced files, expires versions, keeps the live read") {
    val root = freshRoot("vacuum")
    (1L to 3L).foreach(i => ManifestTable.commit(
      Seq((i, s"s$i")).toDF("id", "s").coalesce(1), root,
      if (i == 1L) "overwrite" else "append"))
    ManifestTable.delete(spark, root, Seq(2L).toDF("id"), "id")
    ManifestTable.compact(spark, root, nFiles = 1)
    // 3 per-commit data files + 1 delete file die; the compacted file lives
    val (files, manifests) = ManifestTable.vacuum(spark, root, keepLast = 1)
    assert((files, manifests) == (4L, 4L))
    assert(ManifestTable.versions(spark, root) == Seq(5L))
    assert(ManifestTable.read(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    intercept[IllegalArgumentException](
      ManifestTable.read(spark, root, Some(2L)))
  }

  test("bloom sidecar point lookup prunes files and never drops the true one") {
    val root = freshRoot("bloom")
    ManifestTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1),
      root, "overwrite", bloomCol = Some("id"))
    ManifestTable.commit(Seq((100L, "c")).toDF("id", "s").coalesce(1),
      root, "append", bloomCol = Some("id"))
    val pr = ManifestTable.readBloomPruned(spark, root, "100")
    assert(pr.filesTotal == 2L && pr.filesKept >= 1L && pr.filesKept <= 2L)
    assert(pr.df.where(col("id") === 100L).count() == 1L) // Bloom law: never pruned
    // clean miss: zero rows after the residual filter, schema intact
    val miss = ManifestTable.readBloomPruned(spark, root, "99999")
    assert(miss.df.where(col("id") === 99999L).count() == 0L)
    assert(miss.df.columns.toSeq == Seq("id", "s"))
    // an append WITHOUT a bloom is conservatively kept in every lookup
    ManifestTable.commit(Seq((7L, "z")).toDF("id", "s").coalesce(1), root, "append")
    val pr3 = ManifestTable.readBloomPruned(spark, root, "100")
    assert(pr3.filesTotal == 3L)
    assert(pr3.df.where(col("id") === 100L).count() == 1L)
    assert(pr3.df.where(col("id") === 7L).count() == 1L) // bloom-less file present
    // a mismatched bloom width on append is rejected
    intercept[IllegalArgumentException](ManifestTable.commit(
      Seq((8L, "y")).toDF("id", "s"), root, "append",
      bloomCol = Some("id"), bloomBits = 1 << 8))
    // compact rebuilds the index over the merged file; lookup survives
    ManifestTable.compact(spark, root, nFiles = 1, bloomCol = Some("id"))
    val pc = ManifestTable.readBloomPruned(spark, root, "2")
    assert(pc.filesTotal == 1L && pc.df.where(col("id") === 2L).count() == 1L)
  }

  test("readEvolved aligns schemas by name across commits, NULL-filling gaps") {
    val root = freshRoot("evolve")
    ManifestTable.commit(Seq((1L, "a")).toDF("id", "s"), root, "overwrite")
    // append ADDS a column
    ManifestTable.commit(Seq((2L, "b", 7L)).toDF("id", "s", "extra"), root, "append")
    // append DROPS a column
    ManifestTable.commit(Seq(3L).toDF("id"), root, "append")
    val got = ManifestTable.readEvolved(spark, root)
      .select("id", "s", "extra").as[(Long, Option[String], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, Some("a"), None), (2L, Some("b"), Some(7L)),
      (3L, None, None)))
    // deletes apply after alignment
    ManifestTable.delete(spark, root, Seq(2L).toDF("id"), "id")
    assert(ManifestTable.readEvolved(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("optimistic retry: concurrent appends all land, none lost") {
    val root = freshRoot("retry")
    ManifestTable.commit(Seq((0L, "seed")).toDF("id", "s"), root, "overwrite")
    // 8 threads race their appends through the optimistic loop; the
    // atomic-rename commit point serializes them in SOME order and
    // every loser re-resolves the winner's file set — nothing is lost
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            barrier.await()
            ManifestTable.commitWithRetry(
              Seq((i.toLong, s"w$i")).toDF("id", "s"), root, "append")
          }
        })
      }
      val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.sorted == (2L to 9L), s"got $versions")
    } finally pool.shutdown()
    assert(ManifestTable.read(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == (0L to 8L))
    assert(ManifestTable.history(spark, root).map(_._2) ==
      "overwrite" +: Seq.fill(8)("append"))
  }

  test("reading an uncommitted version or an empty root fails loudly") {
    val root = freshRoot("guards")
    intercept[IllegalArgumentException](ManifestTable.read(spark, root))
    ManifestTable.commit(Seq((1L, "a")).toDF("id", "s"), root, "overwrite")
    intercept[IllegalArgumentException](
      ManifestTable.read(spark, root, Some(7L)))
  }
}
