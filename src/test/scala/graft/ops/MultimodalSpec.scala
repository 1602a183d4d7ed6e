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
}
