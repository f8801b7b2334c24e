package graft.runtime

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gen.ClickstreamGen
import graft.model.ClickstreamEvent
import graft.ops.Pipelines
import graft.sink.InMemoryKV

/** Drives the full six-query engine (4 relational + 2 KV sinks) on a
  * MemoryStream and checks the persisted outputs against batch-computed
  * truths — the end-to-end the reference never had.
  */
class StreamRunnerSpec extends SparkSpec {

  test("ClickstreamProcessor: all six queries persist correct micro-batch output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = ClickstreamGen.events(spark, 400, numPartitions = 2).collect().toSeq
    val stream = MemoryStream[ClickstreamEvent]
    val checkpoint = Files.createTempDirectory("graft-ck").toString
    val runner = new StreamRunner(spark, StreamConfig(checkpoint, batchDurationSec = 1))
    runner.attachListener(_ => ()) // exercise the listener path quietly

    val tables = new java.util.concurrent.ConcurrentHashMap[String, Seq[org.apache.spark.sql.Row]]()
    val write: (DataFrame, String) => Unit = (df, table) =>
      tables.merge(table, df.collect().toSeq, (a, b) => a ++ b)
    val kv = new InMemoryKV

    val queries = ClickstreamProcessor.start(runner, stream.toDF(), write, kv)
    try {
      assert(queries.length == 6)
      stream.addData(evs)
      runner.processAllAvailable()

      // K1: page_view_stats matches the batch pipeline
      val expectedPv = Pipelines.pageViews(evs.toDF()).collect()
      assert(tables.get("page_view_stats").toSet == expectedPv.toSet)

      // K2: one session row per (session, user)
      val sess = tables.get("user_sessions")
      assert(sess.map(r => (r.getString(0), r.getInt(1))).distinct.size == sess.size)
      assert(sess.map(_.getLong(4)).sum == 400L)

      // K4 (the reference's missing purchase persistence): totals match
      val purch = tables.get("purchase_stats")
      val expectedRevenue = evs.filter(_.event_type == "purchase")
        .flatMap(_.total_amount).map(BigDecimal(_)).sum
      assert(purch.map(r => BigDecimal(r.getDouble(3))).sum == expectedRevenue)

      // K3: device stats cover all events
      assert(tables.get("device_stats").map(_.getLong(5)).sum == 400L)

      // K5: KV page counters equal page_view counts per page
      val pvByPage = evs.filter(_.event_type == "page_view")
        .groupBy(_.page).view.mapValues(_.size.toLong).toMap
      pvByPage.foreach { case (page, n) =>
        assert(kv.getCounter(s"page_views:$page") == n, s"page $page")
      }
      // K6: time series recorded with the 24h TTL
      val anyPage = pvByPage.keys.head
      assert(kv.getTimeSeries(s"page_views_ts:$anyPage").nonEmpty)
      assert(kv.getTtl(s"page_views_ts:$anyPage").contains(86400L))

      // K7 (the reference's missing redis purchase metrics)
      val nPurchases = evs.count(_.event_type == "purchase").toLong
      assert(kv.getCounter("purchases:count") == nPurchases)
      assert(BigDecimal(kv.getFloatCounter("revenue:total")) == expectedRevenue)
    } finally runner.stopAll()
  }

  test("AvailableNow trigger drains everything then terminates on its own") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = ClickstreamGen.events(spark, 200, numPartitions = 2).collect().toSeq
    val stream = MemoryStream[ClickstreamEvent]
    stream.addData(evs) // data present BEFORE start — the backfill shape
    val checkpoint = Files.createTempDirectory("graft-ck-an").toString
    val runner = new StreamRunner(spark,
      StreamConfig(checkpoint, availableNow = true))
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val q = runner.start(
      Pipelines.pageViews(stream.toDF(), watermark = "1 minute"), "an_views") {
      (batch, _) => seen.addAndGet(batch.count())
    }
    try {
      // a processing-time query would run until stopped; AvailableNow must
      // finish by itself once the pre-existing data is drained
      assert(q.awaitTermination(120000), "query did not self-terminate")
      assert(seen.get() > 0)
    } finally runner.stopAll()
  }

  test("update mode revises prior windows across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ClickstreamEvent]
    val checkpoint = Files.createTempDirectory("graft-ck2").toString
    val runner = new StreamRunner(spark, StreamConfig(checkpoint, batchDurationSec = 1))
    val seen = scala.collection.mutable.Buffer.empty[(Long, Seq[org.apache.spark.sql.Row])]
    val q = runner.start(Pipelines.pageViews(stream.toDF()), "pv") { (df, id) =>
      seen.synchronized(seen += id -> df.collect().toSeq)
    }
    try {
      def ev(min: Int, sec: Int) = ClickstreamEvent(Some(1), "s",
        java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d"), "/", "page_view",
        "direct", graft.model.Device("d", "b", "o"), "ip", "ua",
        None, None, None, None, None, None)
      stream.addData(ev(0, 10))
      runner.processAllAvailable()
      stream.addData(ev(0, 20)) // same window, next micro-batch → revision
      runner.processAllAvailable()
      val updates = seen.synchronized(seen.flatMap(_._2))
        .filter(_.getTimestamp(0).toString == "2024-01-01 00:00:00.0")
        .map(_.getLong(3))
      assert(updates.toSeq == Seq(1L, 2L), s"got $updates")
    } finally runner.stopAll()
  }

  test("retry wrapper: transient sink failures are retried, batch not lost") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ClickstreamEvent]
    val checkpoint = Files.createTempDirectory("graft-ck3").toString
    val runner = new StreamRunner(spark, StreamConfig(checkpoint, batchDurationSec = 1))
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    runner.start(stream.toDF(), "flaky") { (df, _) =>
      if (attempts.incrementAndGet() == 1) sys.error("transient")
      rows.addAndGet(df.count())
    }
    try {
      stream.addData(ClickstreamGen.events(spark, 10, numPartitions = 1).collect().toSeq)
      runner.processAllAvailable()
      assert(attempts.get() >= 2)
      assert(rows.get() == 10L)
    } finally runner.stopAll()
  }
}
