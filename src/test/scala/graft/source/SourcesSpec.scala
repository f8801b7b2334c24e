package graft.source

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Pipelines
import graft.runtime.{StreamConfig, StreamRunner}

class SourcesSpec extends SparkSpec {

  test("events file stream replays the batch table with identical aggregates") {
    val stream = ClickstreamSource.eventsFileStream(spark, sfDir)
    val q = stream
      .filter(col("event_type") === "view")
      .groupBy(window(col("ts"), "1 hour")).count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("ev_file_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_file_stream")
        .agg(sum("count")).collect()(0).getLong(0)
      val batch = Tables.events(spark, sfDir)
        .filter(col("event_type") === "view").count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("RocksDB state store provider drives a stateful streaming agg") {
    val checkpoint = Files.createTempDirectory("graft-rocks").toString
    val runner = new StreamRunner(spark,
      StreamConfig(checkpoint, batchDurationSec = 1, useRocksDbStateStore = true))
    try {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      val stream = ClickstreamSource.eventsFileStream(spark, sfDir)
        .withColumnRenamed("ts", "timestamp")
        .withColumn("page", col("event_type"))
      val rows = new java.util.concurrent.atomic.AtomicLong(0)
      runner.start(Pipelines.pageViews(
          stream.withColumn("event_type", lit("page_view"))), "rocks_pv") { (df, _) =>
        rows.addAndGet(df.count())
      }
      runner.processAllAvailable()
      assert(rows.get() > 0, "stateful agg produced no output under RocksDB")
    } finally {
      runner.stopAll()
      // restore the default provider for other suites sharing the session
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
