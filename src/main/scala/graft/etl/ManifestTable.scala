package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal manifest-log table format — the metadata-commit half of a
  * lakehouse table (Iceberg/Delta's core idea), built from first
  * principles because no lakehouse connector jars exist on this box
  * (documented in SURVEY §2.1; coursier is offline). What it provides
  * over a bare parquet directory:
  *
  *   - ATOMIC commits on any Hadoop filesystem with atomic file
  *     rename: data files land invisibly under `data/<commit-uuid>/`,
  *     and the commit POINT is one rename of the next manifest into
  *     `_manifests/` — readers resolve the manifest list first, so
  *     they see the old snapshot or the new one, never a torn mix.
  *     This is [[Sinks.publishAudited]]'s WAP contract upgraded from
  *     "replace the directory" to "append OR replace, without moving
  *     data files at all" — object-store-friendly (no dir rename; the
  *     one rename is a small metadata file).
  *   - SNAPSHOT ISOLATION + TIME TRAVEL: manifest v_N names the exact
  *     file set of version N; `read(root, Some(n))` is version n
  *     forever, `read(root, None)` is the latest committed version.
  *   - APPEND as metadata: an append commit writes only the new files
  *     and a manifest referencing old ∪ new — no rewrite of existing
  *     data (the q112 bucketed tables and every parquet sink here
  *     rewrite or move; a 100 TB append must not).
  *
  * Concurrency contract: SINGLE WRITER. Two concurrent commits race to
  * rename the same next-version name; the loser's rename returns false
  * and [[commit]] throws — its data files are left orphaned under
  * data/ (invisible: no manifest names them) and the retry re-stages.
  * That is the documented-honest subset of a real format's optimistic
  * retry loop. Readers need no locks at any concurrency.
  *
  * Manifest file format: plain text, one field per line
  * (`v=`, `mode=`, `rows=`, then one relative data-file path per
  * line after a `files:` marker) — no JSON library dependency, and
  * hand-parseable by any tool. Version files are zero-padded so the
  * lexicographic listing order IS version order. */
object ManifestTable {

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new HPath(root, "_manifests")
  private def manifestPath(root: String, v: Long) =
    new HPath(manifestDir(root), f"v$v%06d.manifest")

  /** Committed versions in ascending order (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsFor(spark, root)
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isFile) // a directory squatting on a manifest name is debris, not a commit
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted
  }

  private def parseManifest(fs: FileSystem, p: HPath): (String, Long, Seq[String]) = {
    val in = fs.open(p)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => bos.write(buf, 0, n))
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val mode = lines.find(_.startsWith("mode=")).map(_.stripPrefix("mode=")).getOrElse("?")
    val rows = lines.find(_.startsWith("rows=")).map(_.stripPrefix("rows=").toLong).getOrElse(-1L)
    val files = lines.dropWhile(_ != "files:").drop(1)
    (mode, rows, files)
  }

  /** Commit `df` as the next version. `mode` = "append" (new files join
    * the previous snapshot's file set) or "overwrite" (new files ARE
    * the snapshot). Returns the committed version number. */
  def commit(df: DataFrame, root: String, mode: String): Long = {
    require(mode == "append" || mode == "overwrite",
      s"mode must be append|overwrite, got $mode")
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    // 1. stage data files under an unreferenced commit dir (invisible
    //    to every reader until a manifest names them)
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = new HPath(root, s"data/$commitId")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val newFiles = fs.listStatus(dataDir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .sorted
      .map(n => s"data/$commitId/$n")
    // 2. resolve the parent snapshot and assemble the new file set
    val prev = versions(spark, root).lastOption
    val prevFiles =
      if (mode == "overwrite" || prev.isEmpty) Seq.empty
      else parseManifest(fs, manifestPath(root, prev.get))._3
    val v = prev.getOrElse(0L) + 1
    val rows = df.sparkSession.read
      .parquet(dataDir.toString).count() // committed-rows stat, one metadata-only count
    // 3. the commit point: write the manifest to a temp name, then ONE
    //    atomic rename. A lost race (file exists) throws — single-writer
    //    contract; the staged files stay orphaned and unreferenced.
    val body = (Seq(s"v=$v", s"mode=$mode", s"rows=$rows", "files:") ++
      prevFiles ++ newFiles).mkString("", "\n", "\n")
    fs.mkdirs(manifestDir(root))
    val tmp = new HPath(manifestDir(root), s".tmp-$commitId")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val target = manifestPath(root, v)
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"manifest commit race at $root v$v — concurrent writer won; " +
          "retry the commit (staged files are unreferenced and harmless)")
    }
    v
  }

  /** Snapshot read: the exact file set manifest `version` names
    * (latest committed version when None). Time travel = pass an
    * older version — immutable forever since data files are never
    * moved or rewritten. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val fs = fsFor(spark, root)
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed at $root (have $vs)")
    val (_, _, files) = parseManifest(fs, manifestPath(root, v))
    require(files.nonEmpty, s"manifest v$v at $root names no files")
    spark.read.parquet(files.map(f => new HPath(root, f).toString): _*)
  }

  /** Version history: (version, mode, rows, n_files) per commit —
    * the table's audit card. */
  def history(spark: SparkSession, root: String): Seq[(Long, String, Long, Long)] = {
    val fs = fsFor(spark, root)
    versions(spark, root).map { v =>
      val (mode, rows, files) = parseManifest(fs, manifestPath(root, v))
      (v, mode, rows, files.size.toLong)
    }
  }

  /** Remove everything under `root` — test/rebuild helper. */
  def drop(spark: SparkSession, root: String): Unit = {
    val fs = fsFor(spark, root)
    val p = new HPath(root)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
