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

  test("generic incremental stream step lifts Jaccard: sequential batches ≡ one-shot") {
    val docs = graft.source.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 300).select("doc_id", "lang", "source", "text")
    val standing = java.nio.file.Files
      .createTempDirectory("jc_stream").resolve("store").toString
    def step(lo: Long, hi: Long, id: Long) =
      Dedup.incrementalStreamStep(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi), id, standing)(
          Dedup.prefixJaccardPairsIncremental(_, _, Seq("lang", "source"), 0.8))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = step(0, 100, 0) ++ step(100, 200, 1) ++ step(200, 300, 2)
    val oneShot = Dedup.prefixJaccardPairs(docs, Seq("lang", "source"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oneShot && got.nonEmpty,
      s"missing=${(oneShot -- got).take(3)} extra=${(got -- oneShot).take(3)}")
  }

  test("streaming minhash near-dup: batches ≡ one-shot, redelivery idempotent") {
    import spark.implicits._
    // near-dup groups planted ACROSS arrival batches: every pair must be
    // emitted exactly once, at its LATER member's arrival
    val s1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val s2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val s3 = "one two three four five six seven eight nine ten"
    val rows = Seq(
      1L -> s1, 2L -> s2, 3L -> s3,          // batch 0
      4L -> s1, 5L -> "unique first words never repeated anywhere else at all",
      6L -> s2,                              // batch 1: dups of 1 and 2
      7L -> s1, 8L -> s3)                    // batch 2: dups of 1, 4 and 3
    val base = java.nio.file.Files.createTempDirectory("mh_stream").toString
    val standing = s"$base/standing"
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[(Long, String)](spark)
    val q = Dedup.minhashPairStream(input.toDF().toDF("doc_id", "text"),
        standing, s"$base/ckpt") { (pairs, id) =>
      emitted ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), id))
    }
    try {
      input.addData(rows.take(3)); q.processAllAvailable()
      input.addData(rows.slice(3, 6)); q.processAllAvailable()
      input.addData(rows.drop(6)); q.processAllAvailable()
    } finally q.stop()
    val got = emitted.map { case (a, b, _) => (a, b) }.toSet
    val oneShot = Dedup.minhashPairsMd5(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oneShot, s"missing=${oneShot -- got} extra=${got -- oneShot}")
    // each pair exactly once, at the batch where its later member arrived
    assert(emitted.size == got.size, s"duplicated emissions: $emitted")
    val arrivalBatch = Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1,
      6L -> 1, 7L -> 2, 8L -> 2)
    emitted.foreach { case (a, b, id) =>
      assert(math.max(arrivalBatch(a), arrivalBatch(b)) == id,
        s"pair ($a,$b) emitted at batch $id")
    }
    // redelivery of the LAST batch (the foreachBatch failure-replay case):
    // the store partition overwrites with identical rows and the standing
    // side excludes the batch id → identical pair frame, store unchanged
    val before = spark.read.parquet(standing).count()
    val redelivered = Dedup.minhashStreamStep(
        rows.drop(6).toDF("doc_id", "text"), batchId = 2, standing)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(redelivered ==
      emitted.filter(_._3 == 2).map { case (a, b, _) => (a, b) }.toSet)
    assert(spark.read.parquet(standing).count() == before)
  }
}
