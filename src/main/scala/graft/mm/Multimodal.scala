package graft.mm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The codec is REAL for still images: PNG/JPEG payloads (detected by magic
  * bytes) decode through `javax.imageio` — in the JDK, no external
  * dependency — yielding pixel dimensions and a mean-intensity feature.
  * Non-image payloads take the deterministic byte-statistics path, whose
  * outputs are reproducible in plain SQL (the DuckDB oracle for
  * `mm_decoded_features` recomputes them). Video/audio codecs are out of
  * scope for this container; their assets flow the byte path untouched.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, media: Array[Byte], format: String,
                            width: Int, height: Int)

  /** Decoded per-asset features. For image payloads `px_width`/`px_height`
    * come from the decoded bitmap and `mean_byte` is the mean RGB component
    * intensity; for opaque payloads they echo the metadata dims and the
    * mean payload byte.
    */
  final case class MediaFeatures(media_id: Long, n_bytes: Int, n_frames: Int,
                                 checksum: Long, mean_byte: Double,
                                 px_width: Int, px_height: Int)

  object Codec {
    val FrameBytes = 64

    /** Checksum modulus: keeps the rolling polynomial inside 63 bits (31·M
      * + 255 < 2^63 — Spark 4 runs ANSI mode, silent wraparound elsewhere
      * would throw here) AND makes the value reproducible by any engine
      * with 64-bit integer arithmetic — the SQL oracle replays the fold.
      */
    val ChecksumMod = 1000000007L

    def detectFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 8 &&
        (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') "png"
      else if (bytes.length >= 2 &&
        (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) "jpeg"
      else "raw"

    /** Rolling polynomial over the payload bytes, mod [[ChecksumMod]]. */
    def checksum(bytes: Array[Byte]): Long = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        sum = (sum * 31 + (bytes(i) & 0xFF)) % ChecksumMod
        i += 1
      }
      sum
    }

    /** Decode one asset. Image payloads go through `javax.imageio`; an
      * unreadable image (truncated file, unsupported subformat) falls back
      * to the byte path rather than failing the partition.
      */
    def decode(r: MediaRow): MediaFeatures = {
      val bytes = r.media
      val img: BufferedImage = detectFormat(bytes) match {
        case "png" | "jpeg" =>
          try ImageIO.read(new ByteArrayInputStream(bytes)) catch { case _: Exception => null }
        case _ => null
      }
      if (img != null) {
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        val nPx = img.getWidth.toLong * img.getHeight * 3
        MediaFeatures(r.media_id, bytes.length, 1, checksum(bytes),
          if (nPx == 0) 0.0 else sum.toDouble / nPx, img.getWidth, img.getHeight)
      } else {
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
        MediaFeatures(r.media_id, bytes.length,
          (bytes.length + FrameBytes - 1) / FrameBytes, checksum(bytes),
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
          r.width, r.height)
      }
    }

    /** Spatial downsample by `factor`. Images are rescaled for real
      * (area-averaged draw, re-encoded as PNG); opaque payloads keep the
      * deterministic every-`factor`-th-byte shape so the stage stays
      * runnable on non-image assets.
      */
    def resize(r: MediaRow, factor: Int): MediaRow = {
      require(factor >= 1)
      val img: BufferedImage = detectFormat(r.media) match {
        case "png" | "jpeg" =>
          try ImageIO.read(new ByteArrayInputStream(r.media)) catch { case _: Exception => null }
        case _ => null
      }
      if (img != null) {
        val nw = math.max(1, img.getWidth / factor)
        val nh = math.max(1, img.getHeight / factor)
        val scaled = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
        val out = new ByteArrayOutputStream()
        ImageIO.write(scaled, "png", out)
        MediaRow(r.media_id, out.toByteArray, "png", nw, nh)
      } else {
        val out = Array.tabulate(r.media.length / factor)(i => r.media(i * factor))
        r.copy(media = out, width = r.width / factor, height = r.height / factor)
      }
    }
  }

  /** Batch-shaped decode over partitions — the Scala analog of a Pandas UDF
    * via `mapInPandas`: executors stream row batches through the codec, so
    * memory stays bounded by batch size, not partition size. Repartition
    * upstream by `media_id` if asset sizes are skewed.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(Codec.decode))
  }

  /** Frame sampling as a pure column expression: logical frame index table
    * per asset (no data copy of the payload — each frame is a slice).
    */
  def frameIndex(df: DataFrame, mediaCol: String = "media",
                 frameBytes: Int = Codec.FrameBytes): DataFrame = {
    val nBytes = length(col(mediaCol))
    val nFrames = ceil(nBytes / lit(frameBytes.toDouble)).cast("int")
    // empty payload → zero frames: sequence(0, -1) would count DOWN and
    // emit two bogus rows, so guard with an empty array
    val idx = when(nFrames > 0, sequence(lit(0), nFrames - 1))
      .otherwise(array().cast("array<int>"))
    df.withColumn("frame_idx", explode(idx))
      .withColumn("frame",
        col(mediaCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .withColumn("frame_len", length(col("frame")))
  }

  /** Frame subsample (every k-th frame — temporal downsampling). */
  def sampleEveryKth(df: DataFrame, k: Int): DataFrame =
    df.filter(pmod(col("frame_idx"), lit(k)) === 0)

  /** Spatial downsample of every asset (batch-shaped, like decode). */
  def resizeAll(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(Codec.resize(_, factor)))
  }

  /** Deterministic PNG fixture assets: real encoded PNG payloads, pinned as
    * Base64 so the bytes — and hence `n_bytes`/`checksum` — are build-time
    * constants, independent of any runtime encoder. Source bitmaps are
    * closed-form (asset k, size w×h: `rgb(x,y) = ((x*41+y*23+k*11)%256,
    * (x*17+y*67+k*5)%256, (x*29+y*53+7+k*3)%256)`), so the decoded
    * component sum is exact arithmetic, not a codec artifact — PNG is
    * lossless and `TYPE_INT_RGB` roundtrips the components bit-for-bit.
    * Dims: 8×6, 5×9, 16×3.
    */
  val PngFixtureAssets: Seq[(Long, String)] = Seq(
    9000001L -> ("iVBORw0KGgoAAAANSUhEUgAAAAgAAAAGCAIAAABxZ0isAAAAoUlEQVR4XgGWAGn/AAAABykRJFIi" +
      "QXszXqREe81VmPZmtR930gAXQzxAVFlpZXaSdpO7h7DkmM0Nqeo2ugcALoZxV5eOgKirqbnI0srl" +
      "+9sCJOwfTf08AEXJpm7aw5fr4MD8/ekNGhIeNzsvVGRAcQBcDNuFHfiuLhXXPzIAUE8pYWxScol7" +
      "g6YAc08QnGAtxXFK7oJnF5OEQKShabW+ksbbFwNDcXTxQcQAAAAASUVORK5CYII="),
    9000002L -> ("iVBORw0KGgoAAAANSUhEUgAAAAUAAAAJCAIAAAB1z3HJAAAAm0lEQVR4XgGQAG//AAsFCjQWJ10n" +
      "RIY4Ya9JfgAiSD9LWVx0anmde5bGjLMAOYt0YpyRi62utL7L3c/oAFDOqXnfxqLw48sBAPQSHQBn" +
      "Ed6QIvu5MxjiRDULVVIAflQTp2Uw0HZN+YdqIpiHAJWXSL6oZee5ghDKnznbvACs2n3V65r+/Lcn" +
      "DdRQHvEAwx2y7C7PFT/sPlAJZ2EmjHpBtZE4XQEAAAAASUVORK5CYII="),
    9000003L -> ("iVBORw0KGgoAAAANSUhEUgAAABAAAAADCAIAAAAV0xgDAAAAnklEQVR4XgGTAGz/ABYKDT8bKmgs" +
      "R5E9ZLpOgeNfngxwuzWB2F6S9YejErC0L9nFTALWaSvnhlT4o30JwAAtTUJWXl9/b3yogJnRkbb6" +
      "otMjs/BMxA111Sqe5kfH92TwCIEZGZ5CKrtrO9iUTPUARJB3baGUlrKxv8PO6NTrEeUIOvYlYwdC" +
      "jBhftSl83jqZB0u2MFzTWW3wgn4Nq48qePhFmdo6b/cAAAAASUVORK5CYII="))

  /** The fixture assets as a media table. Metadata dims are deliberately 0:
    * a correct `px_width`/`px_height` downstream can only come from a real
    * `javax.imageio` decode of the payload, never from metadata echo.
    */
  def pngFixtureMedia(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PngFixtureAssets.map { case (id, b64) =>
      MediaRow(id, java.util.Base64.getDecoder.decode(b64), "png", 0, 0)
    }.toDF()
  }

  /** Build a media table from the documents fixture (text bytes standing in
    * for encoded media) — lets the plumbing run against driver test data.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      lit("fake/raw").as("format"),
      lit(64).as("width"),
      (length(col("text")) / 64).cast("int").as("height"))
}
