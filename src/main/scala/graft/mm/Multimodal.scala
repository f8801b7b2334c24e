package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batch-shaped processing
  * — is real; the codec itself is STUBBED with a deterministic fake
  * (`FakeCodec`) because no image/audio libraries ship in this container.
  * Swapping in a real decoder means replacing `FakeCodec.decode` only; the
  * pipeline shape (a `mapPartitions` over row batches, the Scala analog of
  * `mapInPandas`) stays unchanged.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, media: Array[Byte], format: String,
                            width: Int, height: Int)

  /** Decoded features (what a real decode would produce per asset). */
  final case class MediaFeatures(media_id: Long, n_bytes: Int, n_frames: Int,
                                 checksum: Long, mean_byte: Double)

  /** STUB codec: a deterministic fake standing in for libjpeg/ffmpeg/etc.
    * Real deployments replace `decode`; everything downstream is agnostic.
    */
  object FakeCodec {
    val FrameBytes = 64

    /** STUB "resize": deterministic byte downsample by `factor` (every
      * factor-th byte) — stands in for an image rescale; the pipeline
      * shape (payload in → smaller payload out, metadata adjusted) is
      * what downstream stages depend on.
      */
    def resize(r: MediaRow, factor: Int): MediaRow = {
      require(factor >= 1)
      val out = Array.tabulate(r.media.length / factor)(i => r.media(i * factor))
      r.copy(media = out, width = r.width / factor, height = r.height / factor)
    }

    def decode(r: MediaRow): MediaFeatures = {
      val bytes = r.media
      var sum = 0L; var i = 0
      while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xFF); i += 1 }
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.iterator.map(b => (b & 0xFF).toDouble).sum / bytes.length
      MediaFeatures(r.media_id, bytes.length,
        (bytes.length + FrameBytes - 1) / FrameBytes, sum, mean)
    }
  }

  /** Batch-shaped decode over partitions — the Scala analog of a Pandas UDF
    * via `mapInPandas`: executors stream row batches through the codec, so
    * memory stays bounded by batch size, not partition size. Repartition
    * upstream by `media_id` if asset sizes are skewed.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(FakeCodec.decode))
  }

  /** Frame sampling as a pure column expression: logical frame index table
    * per asset (no data copy of the payload — each frame is a slice).
    */
  def frameIndex(df: DataFrame, mediaCol: String = "media",
                 frameBytes: Int = FakeCodec.FrameBytes): DataFrame = {
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
    media.mapPartitions(_.map(FakeCodec.resize(_, factor)))
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
