package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns plus a typed metadata struct. The Spark side —
  * schema, partition-sized batching, the per-partition decode loop — is
  * real. Two codecs sit behind the seam: [[renderPngs]]/[[decodePngs]]
  * is a REAL image path (JDK `javax.imageio`, actual PNG bytes,
  * oracle-checked round trip — m10); [[stubDecode]] remains the
  * deterministic stand-in for formats whose codecs don't ship in this
  * container (JPEG-with-exif, audio, video) — swap it for a real
  * decoder and nothing else changes, exactly as the PNG path did.
  */
object Multimodal {

  case class MediaMeta(mime: String, nBytes: Long, sha: String)
  case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class DecodedMedia(media_id: Long, width: Int, height: Int,
      nFrames: Int, features: Array[Float])

  /** Wrap a text table as a media table: content = utf-8 bytes (the
    * stand-in for image bytes), metadata computed from the payload. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType.typeName
    require(Set("long", "integer", "short", "byte").contains(idType),
      s"media id column `$idCol` must be integral, got $idType — a string id " +
        "would throw CAST_INVALID_INPUT under ANSI (or null out under non-ANSI " +
        "and crash decode's non-nullable encoder)")
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("nBytes"),
        sha2(encode(col(payloadCol), "UTF-8"), 256).as("sha")).as("meta"))
  }

  /** STUB decoder — deterministic fake: "dimensions" and "features" are
    * pure functions of the bytes. A real build would call the codec here;
    * the per-partition batch loop (one decoder init per partition, not
    * per row) is the part that matters at scale. */
  private def stubDecode(content: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = content.length
    val w = 64 + (n % 512)
    val h = 64 + ((n / 7) % 512)
    val frames = 1 + (n % 16)
    val feats = Array.tabulate(8) { i =>
      var acc = 1469598103934665603L // FNV-1a over the byte stream, per lane
      var j = i
      while (j < n) { acc = (acc ^ content(j)) * 1099511628211L; j += 8 }
      ((acc >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
    (w, h, frames, feats)
  }

  /** Decode pass: mapPartitions so decoder setup happens once per
    * partition (the genuinely imperative step — everything before and
    * after stays declarative). */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: val codec = Codec.init() — once per partition
        rows.map { case (id, bytes) =>
          val (w, h, f, feats) = stubDecode(bytes)
          DecodedMedia(id, w, h, f, feats)
        }
      }
  }

  /** Resize planning: fit each frame inside a maxSide × maxSide box
    * preserving aspect ratio, never upscaling. Pure integer arithmetic
    * over the decoded dimensions — the PLAN is declarative (and
    * oracle-checkable); the pixel work it parameterizes would live next
    * to the codec in [[decode]]'s partition loop. */
  def resizePlan(decoded: Dataset[DecodedMedia], maxSide: Int): DataFrame = {
    require(maxSide > 0, "maxSide must be positive")
    val longest = greatest(col("width"), col("height"))
    val fits = longest <= maxSide
    decoded.toDF().select(
      col("media_id"), col("width"), col("height"),
      when(fits, col("width"))
        .otherwise(greatest(lit(1), ((col("width") * maxSide) / longest).cast("int")))
        .as("out_width"),
      when(fits, col("height"))
        .otherwise(greatest(lit(1), ((col("height") * maxSide) / longest).cast("int")))
        .as("out_height"))
  }

  /** Audio-style fixed-window framing over the raw byte stream: emit
    * (frame_idx, byte_off, byte_len) slices of `window` bytes every
    * `hop` bytes (the waveform-chunking step before any feature
    * extractor). Pure integer arithmetic over the payload length —
    * narrow, zero-shuffle, declarative (sequence + posexplode); the
    * byte slices it parameterizes would be consumed inside [[decode]]'s
    * partition loop. Empty payloads emit no frames; a final partial
    * window is emitted with its true (shorter) length. */
  def byteFrames(media: DataFrame, window: Int, hop: Int): DataFrame = {
    require(window > 0 && hop > 0, "window and hop must be positive")
    media
      .select(col("media_id"), col("meta.nBytes").as("_n"))
      .where(col("_n") > 0)
      .select(col("media_id"), col("_n"),
        posexplode(sequence(lit(0L), col("_n") - 1, lit(hop.toLong))))
      .select(col("media_id"),
        col("pos").cast("long").as("frame_idx"),
        col("col").as("byte_off"),
        least(lit(window.toLong), col("_n") - col("col")).as("byte_len"))
  }

  /** Frame sampling stub: every k-th "frame" index, shape-preserving. */
  def sampleFrames(spark: SparkSession, decoded: Dataset[DecodedMedia], everyK: Int): DataFrame = {
    import spark.implicits._
    decoded.flatMap { d =>
      (0 until d.nFrames by everyK).map(i => (d.media_id, i, d.width, d.height))
    }.toDF("media_id", "frame_idx", "width", "height")
  }

  /** Perceptual 64-bit fingerprint of the decoded payload — the pHash
    * step of media near-dup: the payload is cut into non-overlapping
    * `block`-char patches (the stub stand-in for the 8×8 pixel blocks a
    * real pHash DCTs — the stub decoder's "pixels" ARE the bytes, so the
    * block stream is the decoded representation) and the fingerprint is
    * the one-pass md5 simhash over the patch multiset: bit i = sign of
    * Σ_patches (±1 by bit i of the patch's md5 half). Properties a
    * perceptual hash needs: identical payloads → identical fp; a local
    * edit disturbs only the blocks it touches → small Hamming motion;
    * and the md5 chain keeps it engine-portable (oracle-checked, like
    * m02/m03's byte-deterministic decode). Narrow + codegen: no
    * explode, no shuffle — a scan stays a scan. Empty payloads are
    * excluded (no blocks → no signal, and a shared all-zero fp would
    * glue every empty media into one giant near-dup bucket). */
  def perceptualHashes(media: DataFrame, block: Int = 16): DataFrame = {
    require(block > 0, "block must be positive")
    // qualified: this object's decode(spark, media) shadows the SQL fn
    val payload = org.apache.spark.sql.functions.decode(col("content"), "UTF-8")
    val nBlocks = floor((length(col("_s")) + lit(block - 1)) / lit(block)).cast("int")
    val patches = transform(sequence(lit(1), nBlocks),
      i => col("_s").substr((i - 1) * block + 1, lit(block)))
    media
      .select(col("media_id"), payload.as("_s"))
      .where(length(col("_s")) > 0)
      .select(col("media_id"),
        graft.functions.TextHashExpressions.simhashMd5(patches).as("fp"))
  }

  /** Media near-dup candidate pairs: [[perceptualHashes]] banded through
    * the shared fingerprint machinery (Dedup.fingerprintCandidates —
    * 16-bit band buckets, one shuffle, capped in-bucket join, exact
    * Hamming verify). Same cap/audit contract as the text family. */
  def perceptualCandidates(media: DataFrame, block: Int = 16,
      maxHamming: Int = 8, maxBucketSize: Int = 10000): DataFrame =
    Dedup.fingerprintCandidates(
        perceptualHashes(media, block).withColumnRenamed("media_id", "doc"),
        maxHamming, maxBucketSize)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** ViT-style patch tiling plan: cut each decoded width×height frame
    * into a ceil-grid of `patch`×`patch` tiles, row-major patch ids,
    * edge tiles emitted with their true (smaller) extent. Like
    * [[resizePlan]]/[[byteFrames]], the PLAN is pure integer arithmetic
    * over the decoded dimensions — declarative, narrow (sequence +
    * explode, no shuffle) and oracle-checkable; the pixel gather it
    * parameterizes belongs in [[decode]]'s partition loop next to the
    * codec. */
  def patchGrid(decoded: Dataset[DecodedMedia], patch: Int): DataFrame = {
    require(patch > 0, "patch must be positive")
    // ceil-divisions via floor: Column `/` is fractional, so floor() the
    // quotient explicitly (exact: correctly-rounded division of small
    // ints is never within half-ulp of the wrong integer)
    val nc = floor((col("width").cast("long") + (patch - 1)) / patch).cast("long")
    val nr = floor((col("height").cast("long") + (patch - 1)) / patch).cast("long")
    val pcol = pmod(col("patch_idx"), col("_nc"))
    val prow = floor(col("patch_idx") / col("_nc")).cast("long")
    decoded.toDF()
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), nc.as("_nc"), nr.as("_nr"))
      .select(col("media_id"), col("width"), col("height"), col("_nc"),
        explode(sequence(lit(0L), col("_nr") * col("_nc") - 1)).as("patch_idx"))
      .select(col("media_id"), col("patch_idx"),
        prow.as("prow"), pcol.as("pcol"),
        (pcol * patch).as("x0"), (prow * patch).as("y0"),
        least(lit(patch.toLong), col("width") - pcol * patch).as("p_width"),
        least(lit(patch.toLong), col("height") - prow * patch).as("p_height"))
  }

  case class PngSource(media_id: Long, width: Int, height: Int, g: Int, b: Int)
  case class PngDecoded(media_id: Long, ok: Boolean, width: Option[Int],
      height: Option[Int], r_sum: Option[Long], g_sum: Option[Long],
      b_sum: Option[Long])

  /** REAL image encode — the pixels behind the codec seam: a
    * width×height TYPE_INT_RGB image whose red channel is the integer
    * horizontal gradient r(x) = (x·255) div (width−1) (0 when
    * width = 1) and whose green/blue channels are solid, written to
    * actual PNG bytes with `javax.imageio` (JDK-native, no external
    * jars). Deterministic by construction: PNG is lossless and the
    * pixel function is pure integer arithmetic, so the decoded sums
    * are oracle-checkable — unlike [[stubDecode]], what round-trips
    * here is a real codec, not a hash of the bytes. */
  private[ops] def renderPng(width: Int, height: Int, g: Int, b: Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    require(0 <= g && g <= 255 && 0 <= b && b <= 255, s"bad channels g=$g b=$b")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = if (width == 1) 0 else (x * 255) / (width - 1)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Render pass: one PNG per (media_id, width, height, g, b) row —
    * the encode half of the codec seam, mapPartitions like [[decode]]
    * (codec setup per partition, not per row; ImageIO's disk cache is
    * disabled once per partition — executor-local temp files are a
    * scale hazard, not a cache). */
  def renderPngs(spark: SparkSession, sources: Dataset[PngSource]): DataFrame = {
    import spark.implicits._
    sources.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(s => (s.media_id, renderPng(s.width, s.height, s.g, s.b)))
    }.toDF("media_id", "content")
  }

  /** REAL image decode — `ImageIO.read` over the binary column at the
    * same mapPartitions seam as [[decode]], returning decoded
    * dimensions and exact per-channel pixel sums. A payload the codec
    * rejects (corrupt header, truncated stream, not an image) yields
    * an ok=false null row — an AUDITABLE row, never a task failure
    * (the cap+audit contract applied to codecs: one bad sample in a
    * 100 TB shard must not kill the stage). */
  def decodePngs(spark: SparkSession, media: DataFrame): Dataset[PngDecoded] = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null } // a malformed stream may throw rather than return null
          if (img == null) PngDecoded(id, ok = false, None, None, None, None, None)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (rs, gs, bs) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
                x += 1
              }
              y += 1
            }
            PngDecoded(id, ok = true, Some(w), Some(h), Some(rs), Some(gs), Some(bs))
          }
        }
      }
  }

  case class WavSource(media_id: Long, n_samples: Int, base: Int, step: Int)
  case class WavDecoded(media_id: Long, ok: Boolean, sample_rate: Option[Int],
      n_samples: Option[Long], amp_sum: Option[Long], amp_min: Option[Int],
      amp_max: Option[Int])

  private val WavRate = 16000

  /** REAL audio encode — a canonical RIFF/WAVE file (PCM16 mono,
    * 16 kHz): 44-byte header + little-endian samples
    * s(t) = ((base + t·step) mod 201) − 100, pure integer arithmetic
    * so the decoded amplitude stats are oracle-checkable (the
    * [[renderPng]] principle applied to audio — WAV/PCM is lossless
    * and needs no codec library at all, just the RIFF byte layout). */
  private[ops] def renderWav(nSamples: Int, base: Int, step: Int): Array[Byte] = {
    require(nSamples >= 1, s"need >= 1 samples, got $nSamples")
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(WavRate)
      .putInt(WavRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var t = 0
    while (t < nSamples) {
      bb.putShort((((base + t.toLong * step) % 201).toInt - 100).toShort)
      t += 1
    }
    bb.array()
  }

  /** Render pass: one WAV per source row at the same mapPartitions
    * codec seam as [[renderPngs]]. */
  def renderWavs(spark: SparkSession, sources: Dataset[WavSource]): DataFrame = {
    import spark.implicits._
    sources.mapPartitions(rows =>
      rows.map(s => (s.media_id, renderWav(s.n_samples, s.base, s.step))))
      .toDF("media_id", "content")
  }

  /** REAL audio decode — walk the RIFF chunk list (never assume the
    * 44-byte happy path: fmt/data may be preceded by LIST or other
    * chunks in the wild), validate PCM16 mono, and fold the samples to
    * exact integer amplitude stats (sum / min / max). A payload the
    * parser rejects — wrong magic, truncated chunk, non-PCM format,
    * odd data size — yields an ok=false null row, an AUDITABLE row,
    * never a task failure (the [[decodePngs]] cap+audit codec
    * contract). */
  def decodeWavs(spark: SparkSession, media: DataFrame): Dataset[WavDecoded] = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        parseWav(bytes) match {
          case Some((rate, n, sum, mn, mx)) =>
            WavDecoded(id, ok = true, Some(rate), Some(n), Some(sum), Some(mn), Some(mx))
          case None =>
            WavDecoded(id, ok = false, None, None, None, None, None)
        }
      })
  }

  /** (sampleRate, nSamples, ampSum, ampMin, ampMax) or None if malformed. */
  private[ops] def parseWav(
      bytes: Array[Byte]): Option[(Int, Long, Long, Int, Int)] = {
    def ascii(off: Int, s: String): Boolean =
      bytes.length >= off + 4 && new String(bytes, off, 4, "US-ASCII") == s
    if (bytes == null || bytes.length < 12 || !ascii(0, "RIFF") || !ascii(8, "WAVE"))
      return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1
    var fmtOk = false
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= bytes.length && (data.isEmpty || !fmtOk)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        val audioFormat = bb.getShort(off + 8).toInt
        val channels = bb.getShort(off + 10).toInt
        rate = bb.getInt(off + 12)
        val bits = bb.getShort(off + 22).toInt
        fmtOk = audioFormat == 1 && channels == 1 && bits == 16 && rate > 0
        if (!fmtOk) return None
      } else if (id == "data") {
        data = Some((off + 8, size))
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    data match {
      case Some((dOff, dSize)) if fmtOk && dSize % 2 == 0 && dSize > 0 =>
        val n = dSize / 2
        var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
        var i = 0
        while (i < n) {
          val v = bb.getShort(dOff + 2 * i).toInt
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        Some((rate, n.toLong, sum, mn, mx))
      case _ => None
    }
  }

  case class TarShard(shard: Long, n_samples: Long, payload_bytes: Long,
      tar: Array[Byte])

  /** WebDataset-style training shard export: samples are assigned to
    * shards by the ID-KEYED deterministic hash (u(media_id) — id-keyed
    * on purpose: byte-identical payloads under different ids spread
    * across shards instead of colliding into one, the balance caveat
    * `Packing.layoutOffsets` documents) and each shard is assembled
    * into ONE ustar archive blob with entries `<media_id>.bin` in the
    * deterministic (u, id) shard order. Archive bytes are
    * environment-independent: fixed epoch mtime, EMPTY user/group names
    * (commons-compress otherwise embeds the JVM's `user.name` in every
    * header — re-running as a different OS user would change the
    * SHA-256 of identical shards), 512-byte block size, so the archive
    * is exactly Σ(512 + ceil(size/512)·512) + 1024 bytes — an
    * arithmetic fact the m08 oracle checks against the REAL archive's
    * length without needing tar in SQL.
    *
    * Scale shape: shard and order key are NARROW projections, so the
    * payload bytes move through exactly ONE exchange (the groupByKey) —
    * the in-group sort happens on the buffered entries instead of a
    * second window shuffle. A shard's samples are buffered to build its
    * blob (the `mapGroups` codec seam, same rule as [[decode]]), so
    * callers size `nShards` to the usual WebDataset contract (shards of
    * ~100 MB–1 GB that fit an executor). */
  def tarShards(spark: SparkSession, media: DataFrame,
      nShards: Int): Dataset[TarShard] = {
    import spark.implicits._
    require(nShards > 0, "nShards must be positive")
    val assigned = media.select(col("media_id"), col("content"),
        Sampling.hashUniform(col("media_id").cast("string")).as("_u"))
      .withColumn("_shard", floor(col("_u") * nShards).cast("long"))
      .as[(Long, Array[Byte], Double, Long)]
    assigned.groupByKey(_._4).mapGroups { (shard, it) =>
      // same total order as shuffleShard's (u, id) rank, sorted on the
      // buffered group (mapGroups guarantees no intra-group order)
      val entries = it.map { case (id, bytes, u, _) => (u, id, bytes) }
        .toArray.sortBy(e => (e._1, e._2))
      val bos = new java.io.ByteArrayOutputStream()
      val tar = new org.apache.commons.compress.archivers.tar
        .TarArchiveOutputStream(bos, 512)
      var payload = 0L
      entries.foreach { case (_, id, bytes) =>
        val e = new org.apache.commons.compress.archivers.tar
          .TarArchiveEntry(s"$id.bin")
        e.setSize(bytes.length.toLong)
        e.setModTime(0L) // fixed epoch: bytes must not depend on wall clock
        e.setUserName("") // not the JVM user.name: bytes must not depend on env
        e.setGroupName("")
        tar.putArchiveEntry(e)
        tar.write(bytes)
        tar.closeArchiveEntry()
        payload += bytes.length
      }
      tar.finish()
      tar.close()
      TarShard(shard, entries.length.toLong, payload, bos.toByteArray)
    }
  }

  case class TarSample(shard: Long, key: String, content: Array[Byte])

  /** The ingest side of [[tarShards]]: explode shard blobs back into
    * (shard, key, content) samples — reading WebDataset-style archives
    * INTO the pipeline. `key` is the entry name with its LAST extension
    * stripped (the WebDataset sample-key convention: `000123.jpg` →
    * `000123`, `a.tar.idx` → `a.tar`), kept as a STRING so shards from
    * other producers — whose keys need not be numeric — ingest without
    * throwing; [[tarShards]] output keys are the decimal media ids and
    * cast back losslessly (m09). One narrow flatMap at the codec seam
    * (a tar entry walk is sequential by format). */
  def untarSamples(spark: SparkSession,
      shards: Dataset[TarShard]): Dataset[TarSample] = {
    import spark.implicits._
    shards.flatMap { sh =>
      val in = new org.apache.commons.compress.archivers.tar
        .TarArchiveInputStream(new java.io.ByteArrayInputStream(sh.tar))
      Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        // regular files only: a foreign archive's directory entries (and
        // any special entries the stream surfaces) are structure, not
        // samples — without the filter they'd become empty bogus rows
        .filter(_.isFile)
        .map { e =>
          val name = e.getName
          val dot = name.lastIndexOf('.')
          val key = if (dot > 0) name.substring(0, dot) else name
          TarSample(sh.shard, key, in.readAllBytes())
        }.toVector // the stream is consumed per entry; materialize before it closes
    }
  }
}
