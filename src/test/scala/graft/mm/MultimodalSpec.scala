package graft.mm

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.mm.Multimodal.{Codec, MediaRow}

class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, s) =>
      MediaRow(id, s.getBytes("UTF-8"), "fake/raw", 64, s.length / 64)
    }.toDS()
  }

  /** Deterministic test bitmap: pixel (x, y) = a fixed function of its
    * coordinates, so every feature below has a closed-form expectation.
    */
  private def testImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7) % 256; val g = (y * 11) % 256; val b = (x + y) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("decodeFeatures: batch-shaped byte codec is deterministic and exact") {
    val ds = media((1L, "a" * 130), (2L, ""))
    val out = Multimodal.decodeFeatures(ds).collect().sortBy(_.media_id)
    assert(out(0).n_bytes == 130)
    assert(out(0).n_frames == 3) // ceil(130/64)
    assert(out(0).mean_byte == 'a'.toDouble)
    assert(out(0).px_width == 64 && out(0).px_height == 130 / 64)
    assert(out(1).n_bytes == 0 && out(1).n_frames == 0 && out(1).mean_byte == 0.0)
    // checksum matches an independent computation of the modular fold
    val b = "a".getBytes("UTF-8").head & 0xFF
    var sum = 0L
    (1 to 130).foreach(_ => sum = (sum * 31 + b) % Codec.ChecksumMod)
    assert(out(0).checksum == sum)
  }

  test("decode: PNG payloads go through the real imageio path, pinned") {
    val (w, h) = (16, 9)
    val png = encode(testImage(w, h), "png")
    assert(Codec.detectFormat(png) == "png")
    val f = Codec.decode(MediaRow(5L, png, "png", 0, 0))
    assert(f.px_width == w && f.px_height == h)
    assert(f.n_frames == 1 && f.n_bytes == png.length)
    // PNG is lossless: the decoded mean RGB intensity has a closed form
    var s = 0L
    for (y <- 0 until h; x <- 0 until w) s += (x * 7) % 256 + (y * 11) % 256 + (x + y) % 256
    assert(f.mean_byte == s.toDouble / (w * h * 3))
    assert(f.checksum == Codec.checksum(png))
  }

  test("PngFixtureAssets: pinned Base64 payloads decode to closed-form truth") {
    // The driver-checked `mm_decoded_features` oracle carries these exact
    // values as literal rows; this spec re-derives them from the payloads
    // AND from the closed-form bitmap definition, so a drifting JDK codec
    // or edited constant fails here before it fails the driver check.
    val expected = Seq( // (media_id, n_bytes, checksum, sum, w, h)
      (9000001L, 218, 388385599L, 17264L, 8, 6),
      (9000002L, 212, 901232868L, 16820L, 5, 9),
      (9000003L, 215, 537020428L, 17816L, 16, 3))
    Multimodal.PngFixtureAssets.zip(expected).zipWithIndex.foreach {
      case (((id, b64), (eid, nb, cks, sum, w, h)), k) =>
        assert(id == eid)
        val bytes = java.util.Base64.getDecoder.decode(b64)
        assert(bytes.length == nb && Codec.detectFormat(bytes) == "png")
        assert(Codec.checksum(bytes) == cks)
        val f = Codec.decode(MediaRow(id, bytes, "png", 0, 0))
        assert(f.px_width == w && f.px_height == h && f.n_frames == 1)
        assert(f.mean_byte == sum.toDouble / (w * h * 3))
        // closed-form source bitmap reproduces the pinned component sum
        var s = 0L
        for (y <- 0 until h; x <- 0 until w)
          s += (x * 41 + y * 23 + k * 11) % 256 + (x * 17 + y * 67 + k * 5) % 256 +
            (x * 29 + y * 53 + 7 + k * 3) % 256
        assert(s == sum)
    }
  }

  test("decode: JPEG roundtrip decodes with correct dims and sane intensity") {
    val (w, h) = (32, 24)
    val jpg = encode(testImage(w, h), "jpg")
    assert(Codec.detectFormat(jpg) == "jpeg")
    val f = Codec.decode(MediaRow(6L, jpg, "jpeg", 0, 0))
    assert(f.px_width == w && f.px_height == h)
    // lossy codec: mean intensity close to the source image's, not exact
    var s = 0L
    for (y <- 0 until h; x <- 0 until w) s += (x * 7) % 256 + (y * 11) % 256 + (x + y) % 256
    val exact = s.toDouble / (w * h * 3)
    assert(math.abs(f.mean_byte - exact) < 16.0)
  }

  test("decode: truncated image falls back to byte path, not a crash") {
    val png = encode(testImage(8, 8), "png").take(20)
    val f = Codec.decode(MediaRow(7L, png, "png", 3, 2))
    assert(f.n_bytes == 20 && f.px_width == 3 && f.px_height == 2)
  }

  test("resize: images rescale for real; distributed stage keeps schema") {
    import spark.implicits._
    val png = encode(testImage(40, 20), "png")
    val out = Multimodal.resizeAll(
      Seq(MediaRow(1L, png, "png", 40, 20)).toDS(), factor = 2).collect()(0)
    assert(out.width == 20 && out.height == 10)
    val back = Codec.decode(out)
    assert(back.px_width == 20 && back.px_height == 10)
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

  test("resizeAll downsamples opaque payloads and metadata deterministically") {
    val out = Multimodal.resizeAll(media((1L, "abcdefgh")), factor = 2)
      .collect()(0)
    assert(new String(out.media, "UTF-8") == "aceg")
    assert(out.width == 32 && out.media.length == 4)
  }

  test("mediaFromDocuments plumbs the documents fixture into binary rows") {
    val m = Multimodal.mediaFromDocuments(
      graft.source.Tables(spark, sfDir, "documents"))
    assert(m.schema("media").dataType.typeName == "binary")
    val r = m.select(length(col("media")).as("l")).agg(min("l"), max("l")).collect()(0)
    assert(r.getInt(0) > 0)
  }
}
