package graft.etl

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** S7: hive-partitioned snappy parquet sink (SURVEY.md §2.1).
  *
  * The reference's pandas to_parquet writes a fresh GUID file per run and
  * never overwrites — de-facto append (SURVEY §1.4.4). We make the mode a
  * first-class argument; `overwrite` is the sane default for recomputed
  * layers, `append` reproduces the reference.
  */
object Sinks {
  def writePartitioned(
      df: DataFrame,
      path: String,
      mode: String = "overwrite",
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Unit = {
    df.write
      .mode(mode)
      .option("compression", compression)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** [[writePartitioned]] that also returns the row count of the written
    * frame, measured DURING the write job via the Observation API — the
    * Spark-native form of the reference's informational per-stage row
    * prints (main.py:242-247, 287, 309), at zero extra passes: a
    * `df.count()` before or after the write would re-execute the whole
    * stage plan, which at 100 TB doubles the stage. */
  def writePartitionedCounted(
      df: DataFrame,
      path: String,
      mode: String = "overwrite",
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Long = {
    val obs = Observation()
    writePartitioned(df.observe(obs, count(lit(1)).as("rows")),
      path, mode, partitionBy, compression)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Dynamic partition overwrite: replace ONLY the partitions present in
    * df, leave all others untouched — the write mode for incremental
    * recompute (a daily run that rebuilds one ano/mes does not clobber
    * seven years of history, and does not re-write 100 TB). */
  def overwritePartitionsOf(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Unit = {
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", compression)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively)); f.delete(); ()
  }

  /** Replace `target` with `replacement` without a window where neither
    * copy exists durably: target is first swapped aside to `old` (a
    * location OUTSIDE any table root, so hive discovery never sees it),
    * the replacement moved in, and the old copy deleted last. If the
    * move-in fails, the old copy is restored and the replacement left
    * untouched for the caller's recovery policy. */
  private def swapInto(replacement: java.nio.file.Path, target: java.io.File,
      old: java.io.File): Unit = {
    deleteRecursively(old)
    Option(target.toPath.getParent)
      .foreach(p => java.nio.file.Files.createDirectories(p))
    Option(old.toPath.getParent)
      .foreach(p => java.nio.file.Files.createDirectories(p))
    val hadTarget = target.exists
    if (hadTarget) java.nio.file.Files.move(target.toPath, old.toPath)
    try java.nio.file.Files.move(replacement, target.toPath)
    catch {
      case e: Throwable =>
        if (hadTarget && !target.exists)
          java.nio.file.Files.move(old.toPath, target.toPath)
        throw e
    }
    deleteRecursively(old)
  }

  /** Shared write-audit-publish scaffold. Failure BEFORE or DURING the
    * audit deletes staging (nothing publishable existed); a failure
    * inside `publish` leaves the staged, audit-passed data in place —
    * after a clean audit the staged copy is the valuable one, and the
    * rerun's own staging overwrite supersedes it. */
  private def stagedPublish(df: DataFrame, path: String, audit: () => Unit,
      partitionBy: Seq[String], compression: String)(
      publish: java.io.File => Unit): Long = {
    val staging = new java.io.File(path + ".staging")
    deleteRecursively(staging)
    val rows =
      try {
        val r = writePartitionedCounted(
          df, staging.getPath, "overwrite", partitionBy, compression)
        audit()
        r
      } catch { case e: Throwable => deleteRecursively(staging); throw e }
    publish(staging)
    rows
  }

  /** Write-audit-publish: the ONE-PASS form of the quality-gated
    * overwrite sink. The frame is written to `<path>.staging` with the
    * gate's violation counts observed during that same write job
    * (Quality.observedChecks); `audit()` then reads the observed metrics
    * and throws on violation — staging is deleted and nothing becomes
    * visible at `path`; on a clean audit the staging dir is swapped into
    * place (previous data set aside at `<path>.old`, restored if the
    * swap fails, deleted last — at no point is the published path's data
    * deleted before its replacement is in place). Same externally-
    * visible contract as the two-pass gate (bad data never lands at
    * `path`), but the corpus is scanned once, not twice — at 100 TB that
    * halves the stage. Dir renames are atomic on local/HDFS; object
    * stores need a table format's metadata commit for the publish step
    * (Iceberg/Delta do exactly this pattern). Overwrite-mode only: an
    * append publish would need a merge, which is a table-format commit,
    * not a dir move. Hard-crash recovery = rerun the stage: leftover
    * `.staging`/`.old` dirs are superseded and cleaned by the rerun. */
  def publishAudited(
      df: DataFrame,
      path: String,
      audit: () => Unit,
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Long =
    stagedPublish(df, path, audit, partitionBy, compression) { staging =>
      swapInto(staging.toPath, new java.io.File(path),
        new java.io.File(path + ".old"))
    }

  /** Write-audit-publish for PARTITION-SCOPED overwrites (the
    * incremental-recompute twin of [[publishAudited]]): the frame is
    * staged as a plain overwrite (the staging dir is fresh, so the
    * partitions present there are exactly the partitions dynamic
    * overwrite would replace), audited via the metrics observed during
    * that write, and published by swapping each staged leaf partition
    * dir over its target — untouched partitions are never read,
    * rewritten, or moved, and each leaf's previous data is set aside
    * under `<path>.old` (outside the table root, invisible to hive
    * discovery) and restored if that leaf's swap fails. Per-partition
    * swaps are each atomic on local/HDFS; a cross-partition atomic
    * commit needs a table format. A failure mid-loop keeps
    * already-published leaves and the remaining staged leaves (rerun
    * supersedes both). */
  def publishAuditedPartitions(
      df: DataFrame,
      path: String,
      audit: () => Unit,
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Long =
    stagedPublish(df, path, audit, partitionBy, compression) { staging =>
      def leafDirs(dir: java.io.File, depth: Int): Seq[java.io.File] =
        if (depth == 0) Seq(dir)
        else Option(dir.listFiles).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.contains("="))
          .flatMap(leafDirs(_, depth - 1))
      val oldRoot = new java.io.File(path + ".old")
      leafDirs(staging, partitionBy.size).foreach { leaf =>
        val rel = staging.toPath.relativize(leaf.toPath)
        swapInto(leaf.toPath,
          new java.io.File(path).toPath.resolve(rel).toFile,
          oldRoot.toPath.resolve(rel).toFile)
      }
      deleteRecursively(staging) // _SUCCESS marker + empty skeleton
      deleteRecursively(oldRoot) // empty graveyard skeleton
    }

  /** [[overwritePartitionsOf]] with the observed row count — see
    * [[writePartitionedCounted]] for the zero-extra-pass contract. */
  def overwritePartitionsOfCounted(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = GastosSchema.partitionColumns,
      compression: String = "snappy"): Long = {
    val obs = Observation()
    overwritePartitionsOf(df.observe(obs, count(lit(1)).as("rows")),
      path, partitionBy, compression)
    obs.get("rows").asInstanceOf[Long]
  }
}
