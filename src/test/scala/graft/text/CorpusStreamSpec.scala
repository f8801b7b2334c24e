package graft.text

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch/stream unification for the training-data pipeline itself: the
  * per-document stages (fused text features, quality, fingerprinting,
  * deterministic hash-mod sampling) are stateless narrow transforms, so
  * the SAME code runs over a document stream — this spec feeds the fixture
  * corpus through a MemoryStream and asserts the streamed output equals
  * the batch run row for row.
  */
class CorpusStreamSpec extends SparkSpec {

  test("document-corpus stages produce identical output on a stream") {
    import spark.implicits._

    // THE shared pipeline definition — the same call the backfill
    // entrypoint makes, so this equality really is "same code, both modes"
    def stages(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      Text.curate(df, minQuality = 0.0) // keep all qualities: more rows compared

    val docs = graft.source.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val rows = docs.as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)](spark)
    val q = stages(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("corpus_stream_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(120))
      input.addData(rows.drop(120)) // two micro-batches, not one
      q.processAllAvailable()
    } finally q.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    val streamed = key(spark.table("corpus_stream_out"))
    val batch = key(stages(docs))
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(2)} extra=${(streamed -- batch).take(2)}")
    assert(streamed.nonEmpty)
  }

  test("mixture sampling streams: per-stratum rates on a document stream") {
    import spark.implicits._
    val docs = graft.source.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).limit(200)
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val rates = Map("en" -> 5, "de" -> 3, "es" -> 2, "fr" -> 1, "zh" -> 10)

    val input = MemoryStream[(Long, String, String)](spark)
    val q = Text.mixtureSample(input.toDF().toDF("doc_id", "text", "lang"), rates)
      .select(col("doc_id"), col("lang"))
      .writeStream.format("memory").queryName("mixture_stream_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(100))
      input.addData(rows.drop(100))
      q.processAllAvailable()
    } finally q.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = key(spark.table("mixture_stream_out"))
    val batch = key(Text.mixtureSample(docs, rates).select(col("doc_id"), col("lang")))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("PII scrub streams: redaction output identical batch vs stream") {
    import spark.implicits._
    // salt a synthetic email+IP per row (the fixture text has no PII),
    // exactly as the registered doc_pii_redacted query does
    def scrub(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"),
        Text.redactPii(concat(lit("user"), col("doc_id").cast("string"),
          lit("@example.com 10.0."), (col("doc_id") % 250).cast("string"),
          lit(".7 "), col("text"))).as("redacted"))

    val docs = graft.source.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(150)
    val rows = docs.as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)](spark)
    val q = scrub(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_stream_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(75))
      input.addData(rows.drop(75))
      q.processAllAvailable()
    } finally q.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = key(spark.table("pii_stream_out"))
    assert(streamed == key(scrub(docs)))
    assert(streamed.nonEmpty &&
      streamed.forall { case (_, t) => t.contains("<EMAIL>") && t.contains("<IP>") })
  }

  test("incremental dedup streams: index drops cross-batch, first-seen wins within stream") {
    import spark.implicits._
    val existing = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    // arrival order: 13 arrives before 11 (same text) → 13 survives
    // (FIRST-SEEN, the documented streaming difference from batch min-id)
    val arrivals = Seq(
      (10L, "alpha beta gamma"),   // dup of index 1 → dropped
      (13L, "eta theta iota"),     // fresh, first arrival → kept
      (11L, "eta theta iota"),     // later same-content arrival → dropped
      (12L, "kappa lambda mu"),    // fresh → kept
      (14L, "delta epsilon zeta")) // dup of index 2 → dropped

    val input = MemoryStream[(Long, String)](spark)
    val q = Dedup.incrementalStream(input.toDF().toDF("doc_id", "text"), existing)
      .writeStream.format("memory").queryName("incr_stream_out")
      .outputMode("append").start()
    try {
      input.addData(arrivals.take(2)) // 13 ("eta theta iota") in batch one
      input.addData(arrivals.drop(2)) // its dup 11 in batch TWO: the drop
                                      // requires dedup state to span batches
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("incr_stream_out").collect().map(_.getLong(0)).toSet
    assert(kept == Set(13L, 12L), s"kept=$kept")
  }
}
