package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, element_at, explode, lit, max, min, sequence, shiftright, split}

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
  *   - FILE-LEVEL STATS PRUNING: a commit may record min/max of one
  *     integral column per data file in the manifest line itself;
  *     [[readPruned]] plans ONLY the files whose [min,max] intersects
  *     the predicate range — driver-side metadata pruning, zero I/O
  *     on skipped files (the Iceberg/Delta data-skipping core). Files
  *     committed without stats are conservatively kept.
  *   - ROW-LEVEL DELETES, merge-on-read: [[delete]] commits a small
  *     key file (Iceberg v2's equality-delete shape); reads apply a
  *     broadcast anti-join. At 100 TB a delete touches no data file —
  *     the cost moves to read, and [[compact]] materializes it away.
  *   - COMPACTION: rewrite the live snapshot (deletes applied) into
  *     few large files as a new commit; old versions still time-travel
  *     because their files never moved.
  *   - VACUUM: expire old versions and physically remove data/delete
  *     files no kept manifest references — the explicit, bounded
  *     trade of time-travel depth for storage.
  *   - SCHEMA EVOLUTION on read: [[readEvolved]] aligns each commit's
  *     files by column NAME (missing columns → NULL) so an append may
  *     add or drop columns without rewriting history.
  *
  * Concurrency contract: SINGLE WRITER. Two concurrent commits race to
  * rename the same next-version name; the loser's rename returns false
  * and [[commit]] throws — its data files are left orphaned under
  * data/ (invisible: no manifest names them) and the retry re-stages.
  * That is the documented-honest subset of a real format's optimistic
  * retry loop. Readers need no locks at any concurrency.
  *
  * Still out of scope vs the real formats (documented, not silently
  * absent): optimistic multi-writer commit protocols and
  * column-metrics beyond one dial column (real formats keep stats per
  * column); positional deletes (equality deletes only here).
  *
  * Manifest file format: plain text, one field per line (`v=`,
  * `mode=`, `rows=`, optional `stats_col=`/`delete_key=`, then one
  * relative data-file path per line after a `files:` marker —
  * optionally `path|min|max` when stats were collected — and delete
  * files after an optional `deletes:` marker) — no JSON library
  * dependency, hand-parseable by any tool. Version files are
  * zero-padded so the lexicographic listing order IS version order. */
object ManifestTable {

  /** One data-file entry: the raw manifest line (kept verbatim across
    * appends so inherited stats survive) plus its parsed parts. */
  private final case class FileEntry(line: String) {
    private val parts = line.split('|')
    def path: String = parts(0)
    def stats: Option[(Long, Long)] =
      if (parts.length == 3) Some((parts(1).toLong, parts(2).toLong)) else None
  }

  private final case class Snapshot(
      mode: String, rows: Long, statsCol: Option[String],
      deleteKey: Option[String], bloomCol: Option[String], bloomBits: Option[Int],
      files: Seq[FileEntry], deletes: Seq[String], blooms: Seq[String])

  /** A stats-pruned snapshot read: the planned DataFrame plus the
    * pruning tally (files the manifest names vs files actually read). */
  final case class PrunedRead(df: DataFrame, filesKept: Long, filesTotal: Long)

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

  private def readText(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => bos.write(buf, 0, n))
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  private val SectionMarkers = Set("files:", "deletes:", "blooms:")

  private def parseManifest(fs: FileSystem, p: HPath): Snapshot = {
    val lines = readText(fs, p).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    def field(k: String) = lines.find(_.startsWith(s"$k=")).map(_.stripPrefix(s"$k="))
    def section(marker: String): Seq[String] =
      lines.dropWhile(_ != marker).drop(1).takeWhile(!SectionMarkers.contains(_))
    Snapshot(
      mode = field("mode").getOrElse("?"),
      rows = field("rows").map(_.toLong).getOrElse(-1L),
      statsCol = field("stats_col"),
      deleteKey = field("delete_key"),
      bloomCol = field("bloom_col"),
      bloomBits = field("bloom_bits").map(_.toInt),
      files = section("files:").map(FileEntry),
      deletes = section("deletes:"),
      blooms = section("blooms:"))
  }

  private def snapshotAt(spark: SparkSession, root: String,
      version: Option[Long]): (Long, Snapshot) = {
    val fs = fsFor(spark, root)
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed at $root (have $vs)")
    (v, parseManifest(fs, manifestPath(root, v)))
  }

  /** Stage `df` under an unreferenced commit dir and return the new
    * manifest file lines (with `|min|max` stats when `statsCol` is
    * set) plus the staged row count — ONE scan of only the new files
    * (`_metadata.file_path` grouping), never of the existing table. */
  private def stage(df: DataFrame, root: String, commitId: String,
      statsCol: Option[String]): (Seq[String], Long) = {
    statsCol.foreach(c => require(df.columns.contains(c),
      s"stats column $c not in ${df.columns.mkString(",")}"))
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val dataDir = new HPath(root, s"data/$commitId")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val names = fs.listStatus(dataDir).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted
    // Per-file row counts and stats come from the parquet FOOTERS —
    // driver-side metadata reads, no Spark job (round-13 optimization,
    // guide §6): the old form RE-SCANNED the just-written data with a
    // per-file count/min/max agg, a full second pass over everything
    // the commit wrote — exactly the pass real formats avoid by
    // collecting stats at write time. Footer min/max for INT32/INT64
    // columns is exact (never truncated), so the manifest lines are
    // byte-identical to the scan-derived ones; a stats column of any
    // other physical type falls back to the scan (conservative, same
    // semantics as before).
    val conf = spark.sparkContext.hadoopConfiguration
    import scala.jdk.CollectionConverters._
    final case class FooterInfo(rows: Long, lo: Option[Long], hi: Option[Long],
      statsUsable: Boolean)
    def readFooter(n: String): FooterInfo = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new HPath(dataDir, n), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        statsCol match {
          case None => FooterInfo(rows, None, None, statsUsable = true)
          case Some(c) =>
            val chunks = blocks.flatMap(_.getColumns.asScala
              .find(_.getPath.toDotString == c))
            val intTyped = chunks.nonEmpty && chunks.forall { ch =>
              val t = ch.getPrimitiveType.getPrimitiveTypeName
              (t == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 ||
                t == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32) &&
                ch.getStatistics != null && !ch.getStatistics.isEmpty
            }
            if (!intTyped) FooterInfo(rows, None, None, statsUsable = false)
            else {
              val withVals = chunks.filter(_.getStatistics.hasNonNullValue)
              def asLong(v: Any): Long = v match {
                case l: java.lang.Long => l.longValue()
                case i: java.lang.Integer => i.longValue()
                case other => sys.error(s"unexpected stats value type: $other")
              }
              if (withVals.isEmpty) FooterInfo(rows, None, None, statsUsable = true)
              else FooterInfo(rows,
                Some(withVals.map(ch => asLong(ch.getStatistics.genericGetMin)).min),
                Some(withVals.map(ch => asLong(ch.getStatistics.genericGetMax)).max),
                statsUsable = true)
            }
        }
      } finally r.close()
    }
    val footers = names.map(n => n -> readFooter(n))
    if (footers.forall(_._2.statsUsable)) {
      val lines = footers.map { case (n, fi) =>
        val base = s"data/$commitId/$n"
        (fi.lo, fi.hi) match {
          case (Some(lo), Some(hi)) => s"$base|$lo|$hi"
          case _ => base // all-NULL stats column in this file → never pruned
        }
      }
      (lines, footers.map(_._2.rows).sum)
    } else {
      // non-integral stats column: scan-based stats (the pre-round-13 path)
      val staged = spark.read.parquet(dataDir.toString)
      val aggs: Seq[Column] = count(lit(1)).as("_n") +: statsCol.toSeq.flatMap(c =>
        Seq(min(col(c).cast("long")).as("_lo"), max(col(c).cast("long")).as("_hi")))
      val perFile = staged.groupBy(col("_metadata.file_path").as("_f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect() // bounded: one row per staged file of THIS commit
        .map(r => (r.getString(0), r)).toMap
      val lines = names.map { n =>
        val row = perFile.collectFirst { case (p, r) if p.endsWith("/" + n) => r }
          .getOrElse(sys.error(s"staged file $n missing from stats scan"))
        val base = s"data/$commitId/$n"
        val (lo, hi) = (row.fieldIndex("_lo"), row.fieldIndex("_hi"))
        if (row.isNullAt(lo) || row.isNullAt(hi)) base
        else s"$base|${row.getLong(lo)}|${row.getLong(hi)}"
      }
      val rows = perFile.valuesIterator.map(r => r.getLong(r.fieldIndex("_n"))).sum
      (lines, rows)
    }
  }

  /** The commit point: write the manifest body to a temp name, then
    * ONE atomic rename. A lost race (target exists) throws —
    * single-writer contract; staged files stay orphaned and invisible. */
  private def commitManifest(fs: FileSystem, root: String, v: Long,
      commitId: String, body: String): Unit = {
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
  }

  private def manifestBody(v: Long, mode: String, rows: Long,
      statsCol: Option[String], deleteKey: Option[String],
      bloom: Option[(String, Int)], fileLines: Seq[String],
      deleteLines: Seq[String], bloomLines: Seq[String]): String = {
    val header = Seq(s"v=$v", s"mode=$mode", s"rows=$rows") ++
      statsCol.map(c => s"stats_col=$c") ++
      (if (deleteLines.nonEmpty) deleteKey.map(k => s"delete_key=$k") else Nil) ++
      bloom.toSeq.flatMap { case (c, m) => Seq(s"bloom_col=$c", s"bloom_bits=$m") }
    val delSection = if (deleteLines.isEmpty) Nil else "deletes:" +: deleteLines
    val bloomSection = if (bloomLines.isEmpty) Nil else "blooms:" +: bloomLines
    (header ++ Seq("files:") ++ fileLines ++ delSection ++ bloomSection)
      .mkString("", "\n", "\n")
  }

  /** Per-file Bloom sidecar for a staged commit (the real-format index
    * shape: Delta's bloom index / Iceberg's puffin live NEXT TO the
    * data, never inside the manifest): one tiny parquet of (file, bit)
    * rows per commit under `data/<uuid>/bloomidx` (NOT
    * underscore-prefixed: Spark's hidden-path filter would warn on the
    * explicit sidecar reads; data reads never see the subdir anyway
    * because every snapshot read plans explicit FILE paths, and the
    * only commit-DIR scan — stage()'s stats pass — runs before the
    * sidecar exists). Bit positions are the Kirsch–Mitzenmacher chain of
    * ops/Sketches.bloomBits — (a + r·b) & (bits−1), r < 4, a/b the two
    * 26-bit md5 halves — so a DuckDB oracle replays membership exactly
    * and [[readBloomPruned]]'s driver probe computes the same positions
    * with Md5Mix. Cost: one narrow agg over ONLY the new files. */
  private def stageBloom(spark: SparkSession, root: String, commitId: String,
      bloomCol: String, bloomBits: Int): String = {
    require(bloomBits >= 2 && bloomBits <= (1 << 22) &&
      (bloomBits & (bloomBits - 1)) == 0,
      s"bloomBits must be a power of two in [2, 2^22], got $bloomBits")
    val dataDir = new HPath(root, s"data/$commitId")
    val sidecarRel = s"data/$commitId/bloomidx"
    val staged = spark.read.parquet(dataDir.toString)
    val h = graft.functions.TextHashExpressions.md5Upper(
      col(bloomCol).cast("string"))
    val mask26 = (1L << 26) - 1
    staged.where(col(bloomCol).isNotNull)
      .select(
        org.apache.spark.sql.functions.concat(lit(s"data/$commitId/"),
          element_at(split(col("_metadata.file_path"), "/"), -1)).as("file"),
        h.bitwiseAND(lit(mask26)).as("_a"),
        shiftright(h, 26).bitwiseAND(lit(mask26)).as("_b0"))
      .select(col("file"), col("_a"), col("_b0"),
        explode(sequence(lit(0), lit(3))).as("_r"))
      .select(col("file"),
        (col("_a") + col("_r") * col("_b0"))
          .bitwiseAND(lit((bloomBits - 1).toLong)).as("bit"))
      .distinct()
      .write.mode("errorifexists").parquet(new HPath(root, sidecarRel).toString)
    sidecarRel
  }

  /** Commit `df` as the next version. `mode` = "append" (new files join
    * the previous snapshot's file set; the previous delete set is
    * carried forward) or "overwrite" (new files ARE the snapshot and
    * the delete set clears). With `statsCol`, per-file min/max of that
    * integral column land in the manifest and [[readPruned]] can skip
    * files. Returns the committed version number. */
  def commit(df: DataFrame, root: String, mode: String,
      statsCol: Option[String] = None, bloomCol: Option[String] = None,
      bloomBits: Int = 1 << 16): Long = {
    require(mode == "append" || mode == "overwrite",
      s"mode must be append|overwrite, got $mode")
    bloomCol.foreach(c => require(df.columns.contains(c),
      s"bloom column $c not in ${df.columns.mkString(",")}"))
    val spark = df.sparkSession
    val commitId = java.util.UUID.randomUUID().toString
    val (newLines, rows) = stage(df, root, commitId, statsCol)
    val newBloom = bloomCol.map(c => stageBloom(spark, root, commitId, c, bloomBits))
    resolveAndCommit(spark, root, mode, statsCol, bloomCol, bloomBits,
      commitId, newLines, newBloom, rows)
  }

  /** Optimistic MULTI-WRITER commit — the real formats' concurrency
    * protocol, closing [[commit]]'s documented single-writer gap: data
    * files stage ONCE (they are private to this commitId and conflict
    * with nobody), then the metadata resolve+rename loop retries on a
    * lost race — each attempt re-reads the WINNER's manifest as the
    * new parent, so an append re-resolves its base file set and two
    * concurrent appends both land, in some serial order, neither lost.
    * This is safe exactly because the commit point is one atomic
    * rename: the loser's attempt leaves nothing visible. Contract
    * violations (stats/bloom column mismatch against the new parent)
    * still throw immediately — they are correctness errors, not races.
    * Overwrite-vs-append races resolve by commit order, the same
    * last-writer-wins a real format gives you. */
  def commitWithRetry(df: DataFrame, root: String, mode: String,
      statsCol: Option[String] = None, bloomCol: Option[String] = None,
      bloomBits: Int = 1 << 16, maxAttempts: Int = 8): Long = {
    require(mode == "append" || mode == "overwrite",
      s"mode must be append|overwrite, got $mode")
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    bloomCol.foreach(c => require(df.columns.contains(c),
      s"bloom column $c not in ${df.columns.mkString(",")}"))
    val spark = df.sparkSession
    val commitId = java.util.UUID.randomUUID().toString
    val (newLines, rows) = stage(df, root, commitId, statsCol)
    val newBloom = bloomCol.map(c => stageBloom(spark, root, commitId, c, bloomBits))
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        return resolveAndCommit(spark, root, mode, statsCol, bloomCol,
          bloomBits, commitId, newLines, newBloom, rows)
      } catch {
        case e: IllegalStateException if attempt < maxAttempts =>
          () // lost the rename race — re-resolve against the winner
      }
    }
    -1L // unreachable: the loop returns or the last attempt throws
  }

  /** One metadata commit attempt: resolve the current parent snapshot,
    * run the index-consistency checks against IT, and rename the next
    * manifest into place. Throws IllegalStateException on a lost
    * race — [[commitWithRetry]]'s retry unit. */
  private def resolveAndCommit(spark: SparkSession, root: String,
      mode: String, statsCol: Option[String], bloomCol: Option[String],
      bloomBits: Int, commitId: String, newLines: Seq[String],
      newBloom: Option[String], rows: Long): Long = {
    val fs = fsFor(spark, root)
    val prevV = versions(spark, root).lastOption
    val prev = prevV.map(pv => parseManifest(fs, manifestPath(root, pv)))
    val isAppend = mode == "append" && prev.nonEmpty
    val (prevLines, prevDeletes, prevKey, prevBlooms) =
      if (!isAppend) (Nil, Nil, None, Nil)
      else (prev.get.files.map(_.line), prev.get.deletes,
        prev.get.deleteKey, prev.get.blooms)
    // a snapshot's index columns must be consistent across its commits:
    // appends onto a stats/bloom-bearing snapshot either carry the same
    // column (and bloom width) or none — their files are then
    // conservatively unpruned
    prev.filter(_ => isAppend).flatMap(_.statsCol).foreach { pc =>
      require(statsCol.forall(_ == pc),
        s"append stats_col ${statsCol.get} != table stats_col $pc")
    }
    prev.filter(_ => isAppend).foreach { p =>
      (p.bloomCol, bloomCol) match {
        case (Some(pc), Some(c)) =>
          require(c == pc && p.bloomBits.contains(bloomBits),
            s"append bloom ($c, $bloomBits bits) != table bloom " +
              s"(${pc}, ${p.bloomBits.getOrElse(-1)} bits)")
        case _ => ()
      }
    }
    val snapStats = statsCol.orElse(prev.filter(_ => isAppend).flatMap(_.statsCol))
    val snapBloom = bloomCol.map((_, bloomBits)).orElse(
      prev.filter(_ => isAppend).flatMap(p => p.bloomCol.zip(p.bloomBits)))
    val v = prevV.getOrElse(0L) + 1
    commitManifest(fs, root, v, commitId, manifestBody(
      v, mode, rows, snapStats, prevKey, snapBloom,
      prevLines ++ newLines, prevDeletes, prevBlooms ++ newBloom.toSeq))
    v
  }

  /** Row-level DELETE, merge-on-read (Iceberg v2's equality-delete
    * shape): commit `keys` (one column = `keyCol`, distinct values) as
    * a delete file; every subsequent read of this snapshot anti-joins
    * the accumulated delete set — no data file is touched or moved.
    * The snapshot's data-file set is unchanged; `rows` records the
    * number of delete keys in THIS commit. Requires a committed table
    * and a consistent key column across delete commits. */
  def delete(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String): Long = {
    require(keys.columns.contains(keyCol), s"key column $keyCol missing")
    val fs = fsFor(spark, root)
    val prevV = versions(spark, root).lastOption
    require(prevV.nonEmpty, s"cannot delete from an empty table at $root")
    val prev = parseManifest(fs, manifestPath(root, prevV.get))
    prev.deleteKey.foreach(pk => require(pk == keyCol,
      s"delete key $keyCol != table delete key $pk"))
    val commitId = java.util.UUID.randomUUID().toString
    val (newLines, nKeys) =
      stage(keys.select(col(keyCol)).distinct(), root, commitId, None)
    val v = prevV.get + 1
    commitManifest(fs, root, v, commitId, manifestBody(
      v, "delete", nKeys, prev.statsCol, Some(keyCol),
      prev.bloomCol.zip(prev.bloomBits), prev.files.map(_.line),
      prev.deletes ++ newLines.map(FileEntry(_).path), prev.blooms))
    v
  }

  private def applyDeletes(spark: SparkSession, root: String,
      snap: Snapshot, data: DataFrame): DataFrame =
    if (snap.deletes.isEmpty) data
    else {
      val k = snap.deleteKey.getOrElse(
        sys.error(s"manifest at $root has delete files but no delete_key"))
      val dels = spark.read
        .parquet(snap.deletes.map(f => new HPath(root, f).toString): _*)
        .select(col(k)).distinct()
      // the delete set is small by contract (keys, not rows) — ship it
      // to every executor rather than shuffling the data side
      data.join(broadcast(dels), Seq(k), "left_anti")
    }

  /** Snapshot read: the exact file set manifest `version` names
    * (latest committed version when None), minus any merge-on-read
    * delete keys. Time travel = pass an older version — immutable
    * forever since data files are never moved or rewritten. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val (_, snap) = snapshotAt(spark, root, version)
    require(snap.files.nonEmpty, s"manifest at $root names no files")
    val data = spark.read.parquet(
      snap.files.map(f => new HPath(root, f.path).toString): _*)
    applyDeletes(spark, root, snap, data)
  }

  /** Stats-pruned snapshot read: plan ONLY the data files whose
    * recorded [min,max] of the snapshot's stats column intersects
    * [lo,hi] — metadata-only skipping, zero I/O on pruned files.
    * Files without stats are conservatively kept. The residual
    * predicate is NOT applied (file granularity is coarser than rows);
    * callers keep their row filter, which Spark then pushes into the
    * surviving scans. Deletes apply as in [[read]]. */
  def readPruned(spark: SparkSession, root: String, lo: Long, hi: Long,
      version: Option[Long] = None): PrunedRead = {
    val (_, snap) = snapshotAt(spark, root, version)
    require(snap.statsCol.nonEmpty,
      s"snapshot at $root carries no stats column — commit with statsCol")
    val kept = snap.files.filter(f =>
      f.stats.forall { case (mn, mx) => mn <= hi && mx >= lo })
    require(kept.nonEmpty || snap.files.isEmpty,
      s"every file pruned for [$lo,$hi] at $root — empty scan (plan an empty DF upstream)")
    val data = spark.read.parquet(
      kept.map(f => new HPath(root, f.path).toString): _*)
    PrunedRead(applyDeletes(spark, root, snap, data),
      kept.size.toLong, snap.files.size.toLong)
  }

  /** Bloom-pruned POINT-LOOKUP read: plan only the data files whose
    * sidecar Bloom filter might contain `key` (stringified, hashed with
    * the same md5 chain the sidecar was built with). The Bloom law
    * holds per file — a file holding the key is NEVER pruned; a file
    * without it survives only on full k-position collision — so the
    * residual `col = key` filter on the returned frame gives exact
    * results over a metadata-sized file subset. Files from commits
    * that carried no bloom are conservatively kept. The probe reads
    * ONLY the ≤ 4 probe-bit rows per file from the sidecars (a
    * predicate-pushed tiny scan), never the filters themselves.
    * Sizing honesty: at the default 2¹⁶ bits a file beyond ~10⁵ keys
    * saturates and passes everything — size bloomBits ≈ 10× keys/file
    * at commit time, exactly as the real formats make you. */
  def readBloomPruned(spark: SparkSession, root: String, key: String,
      version: Option[Long] = None): PrunedRead = {
    val (_, snap) = snapshotAt(spark, root, version)
    require(snap.bloomCol.nonEmpty,
      s"snapshot at $root carries no bloom index — commit with bloomCol")
    val m = snap.bloomBits.get
    val h = graft.functions.Md5Mix.halves(
      org.apache.spark.unsafe.types.UTF8String.fromString(key))(0)
    val mask26 = (1L << 26) - 1
    val (a, b0) = (h & mask26, (h >> 26) & mask26)
    val probe = (0 until 4).map(r => (a + r * b0) & (m - 1).toLong).distinct
    val hits: Map[String, Long] =
      if (snap.blooms.isEmpty) Map.empty
      else spark.read
        .parquet(snap.blooms.map(b => new HPath(root, b).toString): _*)
        .where(col("bit").isin(probe: _*))
        .groupBy(col("file"))
        .agg(count(lit(1)).as("_hits")) // bit rows are distinct per file
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bloomedCommits: Set[String] =
      snap.blooms.map(_.split('/')(1)).toSet
    val kept = snap.files.filter { f =>
      val commit = f.path.split('/')(1)
      !bloomedCommits.contains(commit) ||
        hits.getOrElse(f.path, 0L) == probe.size.toLong
    }
    val data =
      if (kept.nonEmpty)
        spark.read.parquet(kept.map(f => new HPath(root, f.path).toString): _*)
      else // a clean miss: empty frame, snapshot schema
        spark.read.parquet(
          snap.files.map(f => new HPath(root, f.path).toString): _*).limit(0)
    PrunedRead(applyDeletes(spark, root, snap, data),
      kept.size.toLong, snap.files.size.toLong)
  }

  /** Schema-evolving snapshot read: each commit's files are read with
    * their OWN schema (all files of one commit dir share it), then
    * aligned by column name — columns missing from an older or newer
    * commit become NULL. This is name-based schema evolution on read:
    * appends may add or drop columns without rewriting history.
    * Deletes apply after alignment (the key must survive in every
    * commit that has rows to delete — enforced by the join analyzer). */
  def readEvolved(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val (_, snap) = snapshotAt(spark, root, version)
    require(snap.files.nonEmpty, s"manifest at $root names no files")
    val byCommit = snap.files.map(_.path).groupBy(p =>
      p.split('/').take(2).mkString("/")) // data/<uuid>
    val parts = byCommit.toSeq.sortBy(_._1).map { case (_, paths) =>
      spark.read.parquet(paths.map(p => new HPath(root, p).toString): _*)
    }
    val merged = parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    applyDeletes(spark, root, snap, merged)
  }

  /** Compaction: materialize the live snapshot (deletes applied) into
    * `nFiles` files as a new commit whose file set is ONLY the new
    * files and whose delete set is empty — read cost drops back to a
    * plain scan, older versions still time-travel (their files never
    * moved). Pass `statsCol` to re-collect pruning stats on the
    * compacted files. Returns the committed version. */
  def compact(spark: SparkSession, root: String, nFiles: Int,
      statsCol: Option[String] = None, bloomCol: Option[String] = None,
      bloomBits: Int = 1 << 16): Long = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val prevV = versions(spark, root).lastOption
    require(prevV.nonEmpty, s"cannot compact an empty table at $root")
    val live = read(spark, root).repartition(nFiles)
    val commitId = java.util.UUID.randomUUID().toString
    val (newLines, rows) = stage(live, root, commitId, statsCol)
    val newBloom = bloomCol.map(c => stageBloom(spark, root, commitId, c, bloomBits))
    val v = prevV.get + 1
    commitManifest(fsFor(spark, root), root, v, commitId, manifestBody(
      v, "compact", rows, statsCol, None, bloomCol.map((_, bloomBits)),
      newLines, Nil, newBloom.toSeq))
    v
  }

  /** Expire all but the last `keepLast` versions and physically delete
    * every data/delete file no kept manifest references — the explicit
    * trade of time-travel depth for storage. Returns
    * (dataFilesDeleted, manifestsExpired). Orphans from crashed
    * commits are swept too (they are referenced by nothing). */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): (Long, Long) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val fs = fsFor(spark, root)
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"nothing to vacuum at $root")
    val (expire, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    val referenced: Set[String] = keep.flatMap { v =>
      val s = parseManifest(fs, manifestPath(root, v))
      s.files.map(_.path) ++ s.deletes
    }.toSet
    val dataRoot = new HPath(root, "data")
    var removed = 0L
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).filter(_.isDirectory).foreach { d =>
        val commitRel = s"data/${d.getPath.getName}"
        val files = fs.listStatus(d.getPath).filter(_.isFile).toSeq
        val anyReferenced = files.exists(f =>
          referenced.contains(s"$commitRel/${f.getPath.getName}"))
        if (!anyReferenced) {
          // whole commit dir is dead (incl. _SUCCESS markers and
          // crashed-commit orphans) — count its data files, drop the dir
          removed += files.count(_.getPath.getName.endsWith(".parquet"))
          fs.delete(d.getPath, true); ()
        } else files.foreach { f =>
          val rel = s"$commitRel/${f.getPath.getName}"
          if (f.getPath.getName.endsWith(".parquet") && !referenced.contains(rel)) {
            fs.delete(f.getPath, false); removed += 1
          }
        }
      }
    }
    expire.foreach(v => fs.delete(manifestPath(root, v), false))
    (removed, expire.size.toLong)
  }

  /** Version history: (version, mode, rows, n_files, n_delete_files)
    * per commit — the table's audit card. `rows` is the row count of
    * THAT commit's new files (delete-key count for delete commits). */
  def history(spark: SparkSession, root: String): Seq[(Long, String, Long, Long, Long)] = {
    val fs = fsFor(spark, root)
    versions(spark, root).map { v =>
      val s = parseManifest(fs, manifestPath(root, v))
      (v, s.mode, s.rows, s.files.size.toLong, s.deletes.size.toLong)
    }
  }

  /** Remove everything under `root` — test/rebuild helper. */
  def drop(spark: SparkSession, root: String): Unit = {
    val fs = fsFor(spark, root)
    val p = new HPath(root)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
