package graft.tools

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.gen.ClickstreamGen
import graft.model.ClickstreamEvent
import graft.runtime.{ClickstreamProcessor, StreamConfig, StreamRunner}
import graft.sink.InMemoryKV

/** Streaming throughput attribution: runs the exact demo protocol
  * (generator → MemoryStream → the six engine queries → in-memory sinks,
  * 50k-event chunks) with a listener that accumulates Spark's per-trigger
  * `durationMs` components and state-store commit times per query, then
  * prints the breakdown the end-to-end events/s number decomposes into.
  *
  *   sbt "runMain graft.tools.StreamProfile [nEvents]"
  *
  * Knobs (env): GRAFT_PROFILE_PARTITIONS (spark.sql.shuffle.partitions for
  * the run; streaming state partition count follows it), GRAFT_ROCKSDB=1
  * (RocksDB state store instead of the default HDFS-backed heap store),
  * GRAFT_PROFILE_TRIGGER_SEC (micro-batch trigger interval; default the
  * demo's reference-inherited 5 s).
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val parts = sys.env.getOrElse("GRAFT_PROFILE_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-stream-profile")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // per-query accumulated durations (ms) keyed by component name
    val acc = new ConcurrentHashMap[String, ConcurrentHashMap[String, Long]]()
    val batches = new ConcurrentHashMap[String, Long]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val m = acc.computeIfAbsent(p.name, _ => new ConcurrentHashMap[String, Long]())
        p.durationMs.forEach((k, v) => m.merge(k, v.longValue(), (a: Long, b: Long) => a + b))
        p.stateOperators.foreach { so =>
          m.merge("state.commit", so.commitTimeMs, (a: Long, b: Long) => a + b)
          m.merge("state.rows", so.numRowsTotal, (a: Long, b: Long) => math.max(a, b))
          // provider-reported resident size (heap map bytes for the HDFS
          // store, block-cache+memtable for RocksDB) — the ladder's
          // per-query state-size column
          m.merge("state.bytes", so.memoryUsedBytes, (a: Long, b: Long) => math.max(a, b))
        }
        batches.merge(p.name, 1L, (a, b) => a + b)
      }
    })

    val trigSec = sys.env.getOrElse("GRAFT_PROFILE_TRIGGER_SEC", "5").toInt
    val checkpoint = Files.createTempDirectory("graft-profile-ckpt").toString
    val runner = new StreamRunner(spark,
      StreamConfig(checkpoint, batchDurationSec = trigSec,
        useRocksDbStateStore = sys.env.get("GRAFT_ROCKSDB").contains("1")))
    val kv = new InMemoryKV
    val captured = new ConcurrentHashMap[String, Long]()
    val write: (DataFrame, String) => Unit =
      (df, table) => captured.merge(table, df.count(), (a, b) => a + b)

    val stream = MemoryStream[ClickstreamEvent]
    ClickstreamProcessor.start(runner, stream.toDF(), write, kv)
    val ds = ClickstreamGen.events(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ds.count()
    val t0 = System.nanoTime()
    ds.toLocalIterator().asScala.grouped(50000).zipWithIndex.foreach { case (chunk, i) =>
      val a0 = System.nanoTime()
      stream.addData(chunk)
      val a1 = System.nanoTime()
      runner.processAllAvailable()
      val a2 = System.nanoTime()
      println(f"[profile] chunk $i: addData=${(a1 - a0) / 1e9}%.1f s " +
        f"drain=${(a2 - a1) / 1e9}%.1f s")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    runner.stopAll()
    ds.unpersist()

    println(f"[profile] $n events, partitions=$parts, trigger=${trigSec}s, " +
      f"rocksdb=${sys.env.get("GRAFT_ROCKSDB").contains("1")}: " +
      f"$secs%.1f s wall, ${n / secs}%.0f events/s")
    val names = acc.keySet().asScala.toSeq.sorted
    for (name <- names) {
      val m = acc.get(name).asScala
      val trig = m.getOrElse("triggerExecution", 0L)
      val plan = m.getOrElse("queryPlanning", 0L)
      val add = m.getOrElse("addBatch", 0L)
      val get = m.getOrElse("getBatch", 0L)
      val wal = m.getOrElse("walCommit", 0L) + m.getOrElse("commitOffsets", 0L) +
        m.getOrElse("latestOffset", 0L)
      val st = m.getOrElse("state.commit", 0L)
      println(f"[profile] $name%-18s batches=${batches.getOrDefault(name, 0L)}%3d " +
        f"trigger=${trig}ms (plan=${plan} addBatch=${add} getBatch=${get} " +
        f"offsets/wal=${wal} stateCommit=${st}) stateRows=${m.getOrElse("state.rows", 0L)} " +
        f"stateBytes=${m.getOrElse("state.bytes", 0L)}")
    }
    spark.stop()
  }
}
