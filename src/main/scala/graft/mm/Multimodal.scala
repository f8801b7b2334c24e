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

  /** REAL audio plumbing: RIFF/WAV PCM needs no codec library, so unlike
    * video (stubbed behind the byte path) the audio branch parses actual
    * wire bytes — a proper RIFF chunk walk, not a fixed-offset peek — and
    * extracts the standard first-pass audio features (per-window energy
    * and zero-crossing rate). Feature arithmetic is all-integer until one
    * final IEEE division, so the DuckDB oracle can replay it exactly from
    * the closed-form fixture waveform; matching is only possible if the
    * byte roundtrip (synthesize → RIFF container → parse → window) is
    * faithful. WavSpec additionally cross-validates the parser against the
    * JDK's own `javax.sound.sampled` reader.
    */
  object Wav {
    final case class Meta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                          nSamples: Int, dataOffset: Int)
    final case class WindowFeatures(media_id: Long, window_idx: Int,
                                    sum_squares: Long, zero_crossings: Long)

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    private def wr16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    private def wr32(b: Array[Byte], o: Int, v: Int): Unit = {
      wr16(b, o, v & 0xFFFF); wr16(b, o + 2, (v >>> 16) & 0xFFFF)
    }

    /** The closed-form fixture waveform: a 16-step integer sawtooth offset
      * by the asset id — `s(i) = (i + mediaId) mod 16 − 8` — chosen so
      * every feature below is small exact integer arithmetic any engine
      * can replay.
      */
    def sample(mediaId: Long, i: Long): Int = (((i + mediaId) % 16) - 8).toInt

    /** Mono PCM16LE WAV with a canonical 44-byte RIFF header. */
    def synthesize(mediaId: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
      val data = nSamples * 2
      val b = new Array[Byte](44 + data)
      "RIFF".getBytes.copyToArray(b, 0); wr32(b, 4, 36 + data)
      "WAVE".getBytes.copyToArray(b, 8)
      "fmt ".getBytes.copyToArray(b, 12); wr32(b, 16, 16)
      wr16(b, 20, 1) // PCM
      wr16(b, 22, 1) // mono
      wr32(b, 24, sampleRate)
      wr32(b, 28, sampleRate * 2) // byte rate
      wr16(b, 32, 2) // block align
      wr16(b, 34, 16) // bits
      "data".getBytes.copyToArray(b, 36); wr32(b, 40, data)
      var i = 0
      while (i < nSamples) { wr16(b, 44 + 2 * i, sample(mediaId, i) & 0xFFFF); i += 1 }
      b
    }

    /** Walk the RIFF chunk list (fmt may be preceded by LIST/fact chunks
      * in the wild — do NOT assume offset 36 for data).
      */
    def parse(bytes: Array[Byte]): Option[Meta] = {
      if (bytes.length < 12 ||
        new String(bytes, 0, 4) != "RIFF" || new String(bytes, 8, 4) != "WAVE")
        return None
      var o = 12
      var rate, channels, bits = -1
      var dataOff, dataLen = -1
      while (o + 8 <= bytes.length) {
        val id = new String(bytes, o, 4)
        val len = le32(bytes, o + 4)
        if (id == "fmt " && o + 24 <= bytes.length) {
          channels = le16(bytes, o + 10)
          rate = le32(bytes, o + 12)
          bits = le16(bytes, o + 22)
        } else if (id == "data") {
          dataOff = o + 8; dataLen = len
        }
        o += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (rate <= 0 || bits != 16 || channels != 1 || dataOff < 0) None
      else Some(Meta(rate, channels, bits,
        math.min(dataLen, bytes.length - dataOff) / 2, dataOff))
    }

    def sampleAt(bytes: Array[Byte], meta: Meta, i: Int): Int =
      le16(bytes, meta.dataOffset + 2 * i).toShort.toInt

    /** Per-window energy + zero crossings over FULL windows (trailing
      * partial window dropped). A crossing is a strict sign-bit change
      * between adjacent samples within the window.
      */
    def windowFeatures(mediaId: Long, bytes: Array[Byte],
        window: Int): Iterator[WindowFeatures] = {
      parse(bytes) match {
        case None => Iterator.empty
        case Some(m) =>
          (0 until m.nSamples / window).iterator.map { wi =>
            var sumSq = 0L
            var zc = 0L
            var j = 0
            while (j < window) {
              val s = sampleAt(bytes, m, wi * window + j)
              sumSq += s.toLong * s
              if (j + 1 < window) {
                val t = sampleAt(bytes, m, wi * window + j + 1)
                if ((s < 0) != (t < 0)) zc += 1
              }
              j += 1
            }
            WindowFeatures(mediaId, wi, sumSq, zc)
          }
      }
    }

    /** The deterministic audio fixture: asset `id` carries `id · 480`
      * samples (id·3 full 160-sample windows).
      */
    def audioFixtureMedia(spark: SparkSession, nAssets: Int = 6): Dataset[MediaRow] = {
      import spark.implicits._
      spark.range(1, nAssets + 1L).as[Long].map { id =>
        MediaRow(id, synthesize(id, (id * 480L).toInt), "wav", 0, 0)
      }
    }

    /** Batch-shaped feature extraction, same shape as [[decodeFeatures]]. */
    def audioFeatures(media: Dataset[MediaRow], window: Int = 160): Dataset[WindowFeatures] = {
      import media.sparkSession.implicits._
      media.mapPartitions(_.flatMap(r => windowFeatures(r.media_id, r.media, window)))
    }
  }
}
