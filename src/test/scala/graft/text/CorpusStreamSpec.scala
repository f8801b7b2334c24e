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

    def stages(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.withColumn("f", Text.featuresStruct(col("text")))
        .withColumn("fingerprint", Text.fingerprint(col("text")))
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 10)
        .filter(col("bucket") < 3) // deterministic 30% sample
        .select(col("doc_id"), col("f.stop_lang").as("lang"),
          Text.qualityFromFeatures(col("f")).as("quality"),
          col("fingerprint"))

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
}
