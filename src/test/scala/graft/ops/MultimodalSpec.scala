package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello media"), (2L, "x")).toDF("doc_id", "text")

  test("asMediaTable: binary payload + typed metadata struct") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(media.schema("content").dataType.typeName == "binary")
    val r = media.where(col("media_id") === 1).select("meta.nBytes", "meta.mime").collect()(0)
    assert(r.getLong(0) == "hello media".getBytes("UTF-8").length)
    assert(r.getString(1) == "application/octet-stream")
  }

  test("decode runs per-partition and is deterministic over the bytes") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text").repartition(2)
    val once = Multimodal.decode(spark, media).collect().sortBy(_.media_id)
    val twice = Multimodal.decode(spark, media).collect().sortBy(_.media_id)
    assert(once.length == 2)
    assert(once.map(_.media_id).toSeq == Seq(1L, 2L))
    // determinism: same bytes -> same fake dimensions and features
    once.zip(twice).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height && a.nFrames == b.nFrames)
      assert(a.features.toSeq == b.features.toSeq)
      assert(a.features.length == 8)
    }
  }

  test("resizePlan fits in the box, preserves aspect, never upscales") {
    import Multimodal.DecodedMedia
    val decoded = Seq(
      DecodedMedia(1L, 100, 50, 1, Array.empty[Float]),   // fits: untouched
      DecodedMedia(2L, 448, 224, 1, Array.empty[Float]),  // 2:1 landscape
      DecodedMedia(3L, 10, 1000, 1, Array.empty[Float]),  // extreme portrait
      DecodedMedia(4L, 224, 224, 1, Array.empty[Float])   // exact boundary
    ).toDS()
    val got = Multimodal.resizePlan(decoded, maxSide = 224)
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("out_width"), r.getAs[Int]("out_height")))).toMap
    assert(got(1L) == ((100, 50)))   // no upscale
    assert(got(2L) == ((224, 112)))  // scaled by 1/2, aspect kept
    assert(got(3L) == ((2, 224)))    // floor(10*224/1000)=2, clamped >= 1
    assert(got(4L) == ((224, 224)))  // boundary: untouched
  }

  test("byteFrames: hop-spaced offsets, partial tail window, empty payload skipped") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(
      Seq((1L, "x" * 2500), (2L, "y" * 1024), (3L, "z" * 100), (4L, ""))
        .toDF("doc_id", "text"),
      "doc_id", "text")
    val got = Multimodal.byteFrames(media, window = 1024, hop = 512)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // 2500 bytes → offsets 0,512,1024,1536,2048; last window truncated to 452
    assert(got(1L).sortBy(_._2).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 1024L), (512L, 1024L), (1024L, 1024L), (1536L, 964L), (2048L, 452L)))
    // frame_idx is the dense 0-based window counter
    assert(got(1L).map(_._2).sorted.toSeq == (0L to 4L).toSeq)
    // exactly one full window at n == window
    assert(got(2L).sortBy(_._2).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 1024L), (512L, 512L)))
    // short payload: one partial frame
    assert(got(3L).map(t => (t._3, t._4)).toSeq == Seq((0L, 100L)))
    // empty payload emits nothing
    assert(!got.contains(4L))
  }

  test("frame sampling emits every k-th frame index, shape preserved") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val decoded = Multimodal.decode(spark, media)
    val frames = Multimodal.sampleFrames(spark, decoded, everyK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val nFrames = decoded.collect().map(d => d.media_id -> d.nFrames).toMap
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val idxs = fs.map(_._2).sorted.toSeq
      assert(idxs == (0 until nFrames(id) by 2).toSeq)
    }
  }

  test("patchGrid tiles a ceil grid with true edge extents") {
    import spark.implicits._
    // 100×65 at patch 32 → 4 cols × 3 rows; right edge 4 px, bottom edge 1 px
    val decoded = Seq(Multimodal.DecodedMedia(1L, 100, 65, 1, Array(0f))).toDS()
    val got = Multimodal.patchGrid(decoded, patch = 32)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    assert(got.length == 12)
    // row-major ids: patch_idx = prow*4 + pcol
    assert(got.forall { case (idx, pr, pc, _, _, _, _) => idx == pr * 4 + pc })
    // interior patch is full-size
    assert(got(0) == ((0L, 0L, 0L, 0L, 0L, 32L, 32L)))
    // bottom-right corner carries both true extents
    assert(got(11) == ((11L, 2L, 3L, 96L, 64L, 4L, 1L)))
    // every pixel is covered exactly once: areas sum to width×height
    assert(got.map(p => p._6 * p._7).sum == 100L * 65L)
  }

  test("perceptualHashes: identical payloads collide, local edits move few bits, empties drop") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val payloads = Seq(
      (1L, base),
      (2L, base),                          // exact dup → identical fp
      (3L, base.replace("lazy", "hazy")),  // one-block edit → small hamming
      (4L, ""),                            // empty → excluded
      (5L, "completely different content with nothing shared at all whatsoever here"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(payloads, "doc_id", "text")
    val fps = Multimodal.perceptualHashes(media, block = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.keySet == Set(1L, 2L, 3L, 5L)) // 4 dropped
    assert(fps(1L) == fps(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(3L)) < ham(fps(1L), fps(5L)),
      s"local edit (${ham(fps(1L), fps(3L))}) should move fewer bits than " +
        s"unrelated content (${ham(fps(1L), fps(5L))})")
    val cands = Multimodal.perceptualCandidates(media, block = 16, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cands.contains((1L, 2L, 0L)), cands.mkString(","))
  }

  test("tarShards: real ustar blobs round-trip every sample; bytes deterministic; length matches the block formula") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    // includes the ustar boundary cases: an EMPTY payload (header-only
    // entry, zero data blocks) and an exactly-512-byte payload (one
    // data block, no padding)
    val corpus = ((1L to 38L).map(i => (i, "payload " * (i % 7).toInt + s"doc$i"))
      :+ (39L, "") :+ (40L, "x" * 512))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(corpus, "doc_id", "text")
    val shards = Multimodal.tarShards(spark, media, nShards = 4).collect()
    assert(shards.map(_.n_samples).sum == 40L)
    // round-trip: every sample comes back byte-identical under its key
    val recovered = scala.collection.mutable.Map.empty[Long, Array[Byte]]
    shards.foreach { sh =>
      val in = new TarArchiveInputStream(
        new java.io.ByteArrayInputStream(sh.tar))
      var e = in.getNextEntry
      var n = 0L
      while (e != null) {
        val id = e.getName.stripSuffix(".bin").toLong
        recovered(id) = in.readAllBytes()
        // deterministic headers: no environment leakage into the bytes
        assert(e.asInstanceOf[org.apache.commons.compress.archivers.tar.TarArchiveEntry]
          .getUserName == "", s"user.name leaked into ${e.getName}'s header")
        n += 1
        e = in.getNextEntry
      }
      assert(n == sh.n_samples)
      // ustar arithmetic: 512-byte header + ceil-padded data per entry,
      // two zero blocks at the end (blockSize 512 — no extra padding)
      val expectedLen = {
        val sizes = {
          val in2 = new TarArchiveInputStream(
            new java.io.ByteArrayInputStream(sh.tar))
          Iterator.continually(in2.getNextEntry).takeWhile(_ != null)
            .map(_.getSize).toSeq
        }
        sizes.map(s => 512L + (s + 511) / 512 * 512).sum + 1024L
      }
      assert(sh.tar.length.toLong == expectedLen,
        s"shard ${sh.shard}: ${sh.tar.length} != $expectedLen")
    }
    val original = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    assert(recovered.size == 40)
    recovered.foreach { case (id, bytes) =>
      assert(java.util.Arrays.equals(bytes, original(id)), s"doc $id differs")
    }
    // determinism: identical input → identical archive bytes
    val again = Multimodal.tarShards(spark, media, nShards = 4).collect()
      .map(s => s.shard -> java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.tar).toSeq).toMap
    shards.foreach { sh =>
      assert(again(sh.shard) == java.security.MessageDigest
        .getInstance("SHA-256").digest(sh.tar).toSeq)
    }
  }

  test("untarSamples tolerates foreign WebDataset keys (non-numeric, multi-dot, no extension)") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos, 512)
    // a directory entry is archive structure, not a sample — must be skipped
    val dir = new TarArchiveEntry("images/")
    tar.putArchiveEntry(dir)
    tar.closeArchiveEntry()
    for ((name, payload) <- Seq("sample.json" -> "{}", "a.tar.idx" -> "ix", "noext" -> "n")) {
      val e = new TarArchiveEntry(name)
      e.setSize(payload.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(payload.getBytes("UTF-8"))
      tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
    val foreign = spark.createDataset(
      Seq(Multimodal.TarShard(0L, 3L, 5L, bos.toByteArray)))(
      org.apache.spark.sql.Encoders.product[Multimodal.TarShard])
    val got = Multimodal.untarSamples(spark, foreign)
      .collect().map(s => s.key -> new String(s.content, "UTF-8")).toMap
    assert(got == Map("sample" -> "{}", "a.tar" -> "ix", "noext" -> "n"))
  }

  test("png round trip: real ImageIO decode reproduces exact dims and channel sums") {
    import spark.implicits._
    val srcs = Seq(
      Multimodal.PngSource(1L, 8, 3, 10, 20),
      Multimodal.PngSource(2L, 1, 1, 255, 0), // width-1 gradient edge: r pinned to 0
      Multimodal.PngSource(3L, 31, 31, 7, 130)).toDS()
    val got = Multimodal.decodePngs(spark, Multimodal.renderPngs(spark, srcs))
      .collect().map(d => d.media_id -> d).toMap
    def rSum(w: Int, h: Int): Long =
      if (w == 1) 0L else h.toLong * (0 until w).map(x => (x * 255) / (w - 1)).sum
    for (s <- Seq((1L, 8, 3, 10, 20), (2L, 1, 1, 255, 0), (3L, 31, 31, 7, 130))) {
      val (id, w, h, g, b) = s
      val d = got(id)
      assert(d.ok && d.width.contains(w) && d.height.contains(h), s"id=$id: $d")
      assert(d.r_sum.contains(rSum(w, h)), s"id=$id r: $d")
      assert(d.g_sum.contains(w.toLong * h * g), s"id=$id g: $d")
      assert(d.b_sum.contains(w.toLong * h * b), s"id=$id b: $d")
    }
  }

  test("corrupt payloads decode to ok=false null audit rows, never a task failure") {
    import spark.implicits._
    val goodPng = {
      val srcs = Seq(Multimodal.PngSource(0L, 4, 4, 1, 2)).toDS()
      Multimodal.renderPngs(spark, srcs).select("content")
        .collect()(0).getAs[Array[Byte]](0)
    }
    val corpus = Seq(
      (1L, "not an image at all".getBytes("UTF-8")),       // garbage
      (2L, goodPng.take(goodPng.length / 2)),              // truncated stream
      (3L, Array.empty[Byte]),                             // empty payload
      (4L, goodPng)                                        // control: decodes
    ).toDF("media_id", "content")
    val got = Multimodal.decodePngs(spark, corpus)
      .collect().map(d => d.media_id -> d).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      val d = got(id)
      assert(!d.ok && d.width.isEmpty && d.r_sum.isEmpty, s"id=$id: $d")
    }
    assert(got(4L).ok && got(4L).width.contains(4) && got(4L).g_sum.contains(16L))
  }

  test("wav round trip: RIFF parse reproduces exact rate and amplitude stats") {
    import spark.implicits._
    val srcs = Seq(
      Multimodal.WavSource(1L, 5, 0, 1),    // samples -100..-96
      Multimodal.WavSource(2L, 300, 50, 7), // wraps the mod-201 cycle
      Multimodal.WavSource(3L, 1, 200, 13)  // single sample: (200 % 201) - 100 = 100
    ).toDS()
    val got = Multimodal.decodeWavs(spark, Multimodal.renderWavs(spark, srcs))
      .collect().map(d => d.media_id -> d).toMap
    def stats(n: Int, base: Int, step: Int): (Long, Int, Int) = {
      val vs = (0 until n).map(t => ((base + t.toLong * step) % 201).toInt - 100)
      (vs.map(_.toLong).sum, vs.min, vs.max)
    }
    for ((id, n, base, step) <- Seq((1L, 5, 0, 1), (2L, 300, 50, 7), (3L, 1, 200, 13))) {
      val d = got(id)
      val (sum, mn, mx) = stats(n, base, step)
      assert(d.ok && d.sample_rate.contains(16000), s"id=$id: $d")
      assert(d.n_samples.contains(n.toLong) && d.amp_sum.contains(sum), s"id=$id: $d")
      assert(d.amp_min.contains(mn) && d.amp_max.contains(mx), s"id=$id: $d")
    }
  }

  test("wav decode survives extra RIFF chunks and rejects malformed payloads") {
    import spark.implicits._
    val good = Multimodal.renderWavs(spark,
        Seq(Multimodal.WavSource(0L, 8, 3, 2)).toDS())
      .select("content").collect()(0).getAs[Array[Byte]](0)
    // splice a LIST chunk between WAVE and fmt — a real-world layout
    // the 44-byte happy path would misparse
    val withList = {
      val list = "LIST".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
      val head = good.take(12)
      val rest = good.drop(12)
      val out = head ++ list ++ rest
      // patch the RIFF size field (bytes 4-7, LE) for the added 12 bytes
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(4, bb.getInt(4) + 12)
      out
    }
    val stereoFmt = { val c = good.clone(); c(22) = 2; c } // channels=2: rejected
    val corpus = Seq(
      (1L, withList),
      (2L, "RIFFxxxxWAVE".getBytes("US-ASCII")), // no chunks at all
      (3L, good.take(30)),                       // truncated mid-header
      (4L, stereoFmt),
      (5L, Array.empty[Byte]),
      (6L, good)
    ).toDF("media_id", "content")
    val got = Multimodal.decodeWavs(spark, corpus)
      .collect().map(d => d.media_id -> d).toMap
    assert(got(1L).ok && got(1L).n_samples.contains(8L), s"LIST chunk: ${got(1L)}")
    for (id <- Seq(2L, 3L, 4L, 5L))
      assert(!got(id).ok && got(id).amp_sum.isEmpty, s"id=$id: ${got(id)}")
    assert(got(6L).ok && got(6L).amp_sum == got(1L).amp_sum)
  }
}
