package graft.mm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.mm.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, s) =>
      MediaRow(id, s.getBytes("UTF-8"), "fake/raw", 64, s.length / 64)
    }.toDS()
  }

  test("decodeFeatures: batch-shaped stub codec is deterministic and exact") {
    val ds = media((1L, "a" * 130), (2L, ""))
    val out = Multimodal.decodeFeatures(ds).collect().sortBy(_.media_id)
    assert(out(0).n_bytes == 130)
    assert(out(0).n_frames == 3) // ceil(130/64)
    assert(out(0).mean_byte == 'a'.toDouble)
    assert(out(1).n_bytes == 0 && out(1).n_frames == 0 && out(1).mean_byte == 0.0)
    // checksum matches an independent computation
    val expect = "a".getBytes("UTF-8").head
    var sum = 0L; (1 to 130).foreach(_ => sum = sum * 31 + (expect & 0xFF))
    assert(out(0).checksum == sum)
  }

  test("frameIndex slices the payload without copying whole assets") {
    val df = media((1L, "x" * 100)).toDF()
    val frames = Multimodal.frameIndex(df).select("media_id", "frame_idx", "frame_len")
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(2)).toSeq == Seq(64, 36))
    val sampled = Multimodal.sampleEveryKth(Multimodal.frameIndex(df), 2).count()
    assert(sampled == 1)
    // empty payload → zero frame rows (sequence(0,-1) would emit two)
    assert(Multimodal.frameIndex(media((9L, "")).toDF()).count() == 0)
  }

  test("resizeAll downsamples payload and metadata deterministically") {
    val out = Multimodal.resizeAll(media((1L, "abcdefgh")), factor = 2)
      .collect()(0)
    assert(new String(out.media, "UTF-8") == "aceg")
    assert(out.width == 32 && out.n_bytesSafe == 4)
  }

  private implicit class MR(r: Multimodal.MediaRow) {
    def n_bytesSafe: Int = r.media.length
  }

  test("mediaFromDocuments plumbs the documents fixture into binary rows") {
    val m = Multimodal.mediaFromDocuments(
      graft.source.Tables(spark, sfDir, "documents"))
    assert(m.schema("media").dataType.typeName == "binary")
    val r = m.select(length(col("media")).as("l")).agg(min("l"), max("l")).collect()(0)
    assert(r.getInt(0) > 0)
  }
}
