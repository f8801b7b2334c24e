package graft.runtime

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.ops.Pipelines
import graft.sink.{JdbcSink, KeyValueSink}

/** T1-T8: the streaming runtime — query lifecycle, triggers, checkpoints,
  * retrying foreachBatch sinks, progress listener, graceful shutdown.
  *
  * Where the reference's runtime is broken, we implement the *intent*:
  *  - its second `start_processing` definition shadows the first, killing
  *    the listener and `awaitAnyTermination` (`stream_processor.py:430,511`)
  *    — here both work;
  *  - `_setup_monitoring` attaches the listener to a per-query object that
  *    has no such API (`:467`) — here it attaches to `spark.streams`;
  *  - graceful stop (`:501-509`, dead code) — here a real shutdown hook.
  */
final case class StreamConfig(
    checkpointDir: String,
    batchDurationSec: Int = 5, // reference default, config.py:51
    outputMode: String = "update",
    /** RocksDB state store: off-heap, spill-to-disk streaming state — the
      * right provider once session/window state exceeds executor heap
      * (SURVEY.md §7.5). Default HDFS-backed in-memory store otherwise.
      */
    useRocksDbStateStore: Boolean = false,
    /** When set, every sink is wrapped in the ExactlyOnce batchId ledger
      * (namespaced by this config's checkpoint dir — coupled lifecycles).
      */
    ledger: Option[KeyValueSink] = None,
    /** `Trigger.AvailableNow`: drain everything currently available in
      * micro-batches, then stop — the catch-up/backfill mode (run the
      * streaming pipeline as a terminating batch job, checkpoint-compatible
      * with the continuous deployment). Default: the reference's
      * processing-time trigger.
      */
    availableNow: Boolean = false)

class StreamRunner(spark: SparkSession, cfg: StreamConfig) {

  if (cfg.useRocksDbStateStore)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private val queries = scala.collection.mutable.Buffer.empty[StreamingQuery]
  private val stopping = new AtomicBoolean(false)

  /** T7: progress/lifecycle logging — rows/sec and batch duration per
    * trigger (the reference's dead `_setup_monitoring`, attached properly).
    */
  def attachListener(log: String => Unit = s => Console.err.println(s)): Unit =
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        log(s"[stream] started ${e.name} (${e.id})")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        log(f"[stream] ${e.progress.name}: ${e.progress.numInputRows} rows, " +
          f"${e.progress.processedRowsPerSecond}%.1f rows/s, " +
          s"batch ${e.progress.batchDuration} ms")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        log(s"[stream] terminated ${e.id}" +
          e.exception.map(x => s" with error: $x").getOrElse(""))
    })

  /** T1/T2/T3/T4/T5: start one update-mode micro-batch query with its own
    * checkpoint dir and a retry-wrapped foreachBatch sink. Empty batches
    * are skipped (P8, the reference's `batch_df.isEmpty()` guards).
    */
  def start(df: DataFrame, name: String)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // ledger (outermost) → retry (inner): failed retries never commit the
    // ledger entry, so the batch is re-attempted on redelivery.
    val retried: (DataFrame, Long) => Unit =
      (batch, id) => JdbcSink.retry()(sink(batch, id))
    val effective = cfg.ledger
      .map(l => ExactlyOnce.wrap(name, l, cfg.checkpointDir)(retried))
      .getOrElse(retried)
    val q = df.writeStream
      .queryName(name)
      .outputMode(cfg.outputMode)
      .option("checkpointLocation", s"${cfg.checkpointDir}/$name")
      .trigger(if (cfg.availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(s"${cfg.batchDurationSec} seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) effective(batch, id)
      }
      .start()
    queries.synchronized(queries += q)
    q
  }

  def active: Seq[StreamingQuery] = queries.synchronized(queries.toSeq)

  /** T6 (intended path): block on any termination; a JVM shutdown hook
    * stops every active query gracefully.
    */
  def awaitAnyTermination(): Unit = {
    sys.addShutdownHook(stopAll())
    spark.streams.awaitAnyTermination()
  }

  def stopAll(): Unit = if (stopping.compareAndSet(false, true)) {
    active.foreach { q => try q.stop() catch { case _: Throwable => () } }
  }

  def processAllAvailable(): Unit = active.foreach(_.processAllAvailable())
}

/** Exactly-once-ish sink discipline (SURVEY.md §7.4.5): foreachBatch +
  * external writes are at-least-once after failure/restart — the same
  * micro-batch can be re-delivered with the same batchId. Wrapping the
  * sink with a batchId ledger makes redelivery a no-op; combined with
  * `JdbcSink.upsert` (idempotent by key) either mechanism alone suffices,
  * together they cover both duplicate-batch and revised-row cases.
  * The reference offers only retries (`stream_processor.py:305-324`).
  *
  * `namespace` MUST share the checkpoint's lifecycle (StreamRunner passes
  * its checkpoint dir): batchIds are stable across restarts only while
  * the checkpoint lives — if the checkpoint is deleted, batchIds restart
  * from 0, so the ledger namespace must be cleared (or changed) with it
  * or old entries would silently swallow the replayed batches.
  */
object ExactlyOnce {
  def wrap(queryName: String, ledger: KeyValueSink, namespace: String = "")(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (df, batchId) =>
      val key = s"graft:batch:$namespace:$queryName:$batchId"
      if (ledger.get(key).isEmpty) {
        sink(df, batchId)
        val p = ledger.pipeline()
        p.setEx(key, "done", 7 * 86400L) // atomic; entries age out
        p.execute()
      }
  }
}

/** The engine assembled: the reference's four concurrent pipelines
  * (`stream_processor.py:515-522`) + the two Redis paths, wired to real
  * sinks. `jdbcWrite`/KV are injected so tests run fully in-process.
  */
object ClickstreamProcessor {

  /** Sink for page-view window counts → `page_view_stats` (K1). */
  def pageViewStats(write: (DataFrame, String) => Unit)(batch: DataFrame, id: Long): Unit =
    write(batch, "page_view_stats")

  /** K2: session rollups with CSV-flattened arrays → `user_sessions`. */
  def sessionStats(write: (DataFrame, String) => Unit)(batch: DataFrame, id: Long): Unit =
    write(batch, "user_sessions")

  /** K4: the reference's missing `save_purchase_stats_to_postgres`. */
  def purchaseStats(write: (DataFrame, String) => Unit)(batch: DataFrame, id: Long): Unit =
    write(batch, "purchase_stats")

  /** K3: device stats → `device_stats`. */
  def deviceStats(write: (DataFrame, String) => Unit)(batch: DataFrame, id: Long): Unit =
    write(batch, "device_stats")

  /** K5+K6: per-page counters and 24h time-series in the KV store —
    * the reference's intended `update_redis_page_counts`
    * (`stream_processor.py:363-402`): re-aggregate the micro-batch by page
    * (bounded by the 14-page vocabulary, so the collect is safe), then one
    * pipelined round trip.
    */
  def redisPageCounts(kv: KeyValueSink)(batch: DataFrame, id: Long): Unit = {
    // One batch-level series timestamp (the reference stamps the batch with
    // now(); we use the batch's max event time — null-safe: a batch whose
    // timestamps are all null, e.g. malformed JSON, still counts pages but
    // records no series point).
    val tsRow = batch.agg(unix_timestamp(max(col("timestamp"))).as("ts")).collect()(0)
    val batchTs = if (tsRow.isNullAt(0)) None else Some(tsRow.getLong(0))
    val counts = Pipelines.pageCounts(batch).collect()
    val p = kv.pipeline()
    counts.foreach { r =>
      val page = r.getString(0)
      val n = r.getLong(1)
      p.increment(s"page_views:$page", n)
      batchTs.foreach(ts =>
        p.addTimeSeries(s"page_views_ts:$page", ts, n, ttlSec = 86400L))
    }
    p.execute()
  }

  /** K7: the reference's missing `update_redis_purchase_metrics` — running
    * revenue/purchase counters (minimal faithful interpretation of
    * `stream_processor.py:243-249`).
    */
  def redisPurchaseMetrics(kv: KeyValueSink)(batch: DataFrame, id: Long): Unit = {
    val row = batch.agg(
      count(lit(1)).as("n"),
      sum(col("total_amount").cast("decimal(18,2)")).cast("double").as("revenue"))
      .collect()(0)
    val p = kv.pipeline()
    p.increment("purchases:count", row.getLong(0))
    if (!row.isNullAt(1)) p.incrementByFloat("revenue:total", row.getDouble(1))
    p.execute()
  }

  /** Upsert keys for each relational table — the window/dimension columns
    * that identify a row across update-mode revisions (requires a unique
    * index on these columns in the target database).
    */
  val tableKeys: Map[String, Seq[String]] = Map(
    "page_view_stats" -> Seq("window_start", "window_end", "page"),
    "user_sessions" -> Seq("session_id", "user_id"),
    "purchase_stats" -> Seq("window_start", "window_end"),
    "device_stats" -> Seq("window_start", "window_end", "device_type",
      "browser", "operating_system"))

  /** Start all six queries (4 JDBC + 2 KV) off one source DataFrame. */
  def start(runner: StreamRunner, source: DataFrame,
            write: (DataFrame, String) => Unit, kv: KeyValueSink): Seq[StreamingQuery] = {
    val purchases = source.filter(col("event_type") === "purchase")
    Seq(
      runner.start(Pipelines.pageViews(source), "page_views")(pageViewStats(write)),
      runner.start(source.filter(col("event_type") === "page_view"),
        "redis_page_views")(redisPageCounts(kv)),
      runner.start(Pipelines.sessions(source), "user_sessions")(sessionStats(write)),
      runner.start(Pipelines.conversions(source), "conversions")(purchaseStats(write)),
      runner.start(purchases, "redis_purchases")(redisPurchaseMetrics(kv)),
      runner.start(Pipelines.deviceStats(source), "device_stats")(deviceStats(write)))
  }
}
