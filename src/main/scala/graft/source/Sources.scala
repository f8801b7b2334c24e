package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.model.Schemas

/** Batch table loaders for the driver test data
  * (`/root/testdata/sf{N}/{name}.parquet`, see /root/repo/TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // Footer SCHEMAS memoized per (path, size, mtime) — the ScanSpread
  // row-group-memo idiom applied to schema inference: every registered
  // query opens its tables through here, and a bare
  // spark.read.parquet(path) runs one footer-reading JOB per call
  // (~0.05-0.1 s of driver latency each; ~190 queries × reps × tables
  // per bench). With the schema supplied, no inference job runs.
  // Keyed on size+mtime so a regenerated fixture re-infers; bounded
  // like the ScanSpread cache (at capacity new keys are computed but
  // not inserted); non-local paths fall through to plain inference.
  // Staleness window (ADVICE r15): a fixture regenerated IN PLACE with
  // identical byte size within one mtime tick would serve a stale
  // schema — acceptable for the driver's immutable local fixtures.
  // The key also carries the nanosAsLong legacy conf, because inference
  // is conf-DEPENDENT (INT64 TIMESTAMP(NANOS) surfaces as LongType only
  // under it): a cache hit must never replay a schema inferred under a
  // different conf than the session's current one.
  private val MaxSchemaEntries = 1024
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long, String), org.apache.spark.sql.types.StructType]()

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    if (!f.isFile) return spark.read.parquet(path)
    val nanosConf = spark.conf.getOption(
      "spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val key = (path, f.length, f.lastModified, nanosConf)
    val hit = schemaCache.get(key)
    val schema =
      if (hit != null) hit
      else {
        val s = spark.read.parquet(path).schema
        if (schemaCache.size < MaxSchemaEntries) schemaCache.put(key, s)
        s
      }
    spark.read.schema(schema).parquet(path)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => readCached(spark, s"$dir/$n.parquet")
    }

  /** `events.parquet` fixtures have carried two `ts` encodings across driver
    * regenerations: INT64 TIMESTAMP(NANOS) (rejected by Spark's reader
    * without `nanosAsLong`, surfaced as Long) and plain TIMESTAMP(MICROS)
    * (surfaced as TIMESTAMP or TIMESTAMP_NTZ depending on the footer's
    * isAdjustedToUTC flag). Branch on the surfaced type instead of assuming
    * one encoding, so a fixture regeneration can't dark the events surface.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptTs(readCached(spark, s"$dir/events.parquet"))
  }

  /** Normalize the `ts` column to session-zone TIMESTAMP, whatever encoding
    * the fixture carries. Long nanos use exact integer math (`div 1000`) — a
    * double-based division would lose precision at 2024-epoch nanosecond
    * magnitudes (~1.7e18). NTZ values are wall-clock UTC (the generator
    * writes UTC instants), so the cast under the UTC session zone is exact.
    */
  def adaptTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported type $other; expected INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ")
    }
}

/** Kafka source config. The reference hardcodes broker/topic at
  * `spark_processor/stream_processor.py:113-114` despite loading env config
  * (`config.py:12-13`); we honor the config, and wire `maxOffsetsPerTrigger`
  * (`config.py:53`) which the reference declares but never applies.
  */
final case class KafkaSourceConfig(
    bootstrapServers: String = sys.env.getOrElse("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"),
    topic: String = sys.env.getOrElse("KAFKA_TOPIC", "clickstream"),
    startingOffsets: String = "latest",
    maxOffsetsPerTrigger: Option[Long] = Some(10000L))

/** The streaming source boundary: raw Kafka-shaped frames → typed events.
  *
  * `decode` is the pure part (reference `stream_processor.py:120-126`):
  * cast key/value binary→string, `from_json` against the declared schema
  * (PERMISSIVE: corrupt rows → null struct), star-expand the payload.
  * It is source-agnostic so tests can drive it from MemoryStream or files.
  */
object ClickstreamSource {

  /** S1: the Kafka streaming source (requires the kafka connector jar on
    * the cluster classpath; not present in this container — exercised only
    * through `decode` + MemoryStream in tests).
    */
  def kafka(spark: SparkSession, cfg: KafkaSourceConfig = KafkaSourceConfig()): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topic)
      .option("startingOffsets", cfg.startingOffsets)
    decode(cfg.maxOffsetsPerTrigger
      .fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString)).load())
  }

  /** P1+P2+P3: `(key, value, timestamp)` frame → flattened typed events with
    * `kafka_key` / `kafka_timestamp` envelope columns
    * (reference `stream_processor.py:120-126`).
    */
  def decode(raw: DataFrame): DataFrame =
    raw.select(
        col("key").cast("string").as("kafka_key"),
        from_json(col("value").cast("string"), Schemas.event).as("data"),
        col("timestamp").as("kafka_timestamp"))
      .select(col("kafka_key"), col("data.*"), col("kafka_timestamp"))

  /** Batch twin: parse a Dataset of raw JSON strings (no Kafka envelope). */
  def decodeJson(json: DataFrame, valueCol: String = "value"): DataFrame = {
    val parsed = json.select(from_json(col(valueCol).cast("string"), Schemas.event).as("data"))
    parsed.select(col("data.*"))
  }

  /** Ingest-robustness variant of the decode boundary: parse raw JSON
    * against `schema`, keeping syntactically malformed records as
    * FIRST-CLASS rows flagged `is_corrupt` instead of silently nulling
    * them (what PERMISSIVE `from_json` alone does). The quarantine split
    * is what a production ingest needs: corrupt counts are an SLO metric,
    * and the raw line survives in `valueCol` for replay after a parser
    * fix — the `_corrupt_record` column of Spark's file sources,
    * reconstructed at the stream boundary where that option doesn't
    * exist as an option (PERMISSIVE `from_json` without it returns an
    * ALL-NULL struct for malformed input — indistinguishable from a
    * legitimately null payload; the corrupt-record field added to the
    * parse schema here is the only reliable malformation signal).
    *
    * Quarantine = any record the parser could not FULLY convert:
    * syntactic malformation, or a well-formed line whose field value
    * cannot convert to the declared type (Spark's PERMISSIVE
    * corrupt-record contract — partial conversions also record the raw
    * line). Semantically-null fields in convertible records flow
    * through un-flagged — the downstream quality gate's job
    * (`ops.Quality`), not the parser's.
    *
    * Scale shape: one narrow codegen'd projection — no shuffle, no UDF;
    * the flag reads the corrupt-record field of the same `from_json`
    * the happy path already pays for. Works identically on batch and
    * streaming frames.
    */
  def decodeJsonQuarantine(json: DataFrame, schema: org.apache.spark.sql.types.StructType,
                           valueCol: String = "value"): DataFrame = {
    val parseSchema = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    json.withColumn("data", from_json(col(valueCol).cast("string"), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("is_corrupt", col("data._corrupt_record").isNotNull)
  }

  /** S4: the Kafka producer path — typed events → JSON wire frames →
    * Kafka sink (replaces the reference's hand-rolled confluent-kafka
    * client, `kafka_produer/producer.py:51-118`; delivery guarantees come
    * from the sink instead of per-record callbacks). Works for both batch
    * (`df.write`) and streaming (`df.writeStream`) frames produced by
    * `graft.gen.ClickstreamGen.toWire`.
    */
  def kafkaSink(wire: DataFrame, cfg: KafkaSourceConfig = KafkaSourceConfig()): Unit =
    wire.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
      .save()

  /** File streaming source: treat a directory of event parquet files as an
    * unbounded stream (file-source schema must be provided up front). The
    * batch `events` table becomes a replayable stream — the standard way
    * to backfill the streaming pipelines from historical data.
    */
  def eventsFileStream(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file source wants a directory; select the events file by glob.
    Tables.adaptTs(spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }
}
