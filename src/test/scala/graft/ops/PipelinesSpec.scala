package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gen.ClickstreamGen
import graft.model.{ClickstreamEvent, Device}

class PipelinesSpec extends SparkSpec {

  private def ev(userId: Int, session: String, ts: String, page: String,
                 eventType: String, amount: Option[Double] = None): ClickstreamEvent =
    ClickstreamEvent(Some(userId), session, Timestamp.valueOf(ts), page, eventType,
      "direct", Device("desktop", "chrome", "linux"), "192.168.1.1", "UA",
      None, None, None, None,
      if (eventType == "purchase") Some("o-" + ts) else None, amount)

  private val fixture = Seq(
    ev(1, "s1", "2024-01-01 00:00:10", "/", "page_view"),
    ev(1, "s1", "2024-01-01 00:00:40", "/cart", "page_view"),
    ev(1, "s1", "2024-01-01 00:01:10", "/payment", "purchase", Some(100.0)),
    ev(2, "s2", "2024-01-01 00:00:20", "/", "page_view"),
    ev(2, "s2", "2024-01-01 00:02:30", "/payment", "purchase", Some(50.5)),
    ev(3, "s3", "2024-01-01 01:00:00", "/about", "button_click"))

  test("pageViews: 1-minute tumbling counts, filtered to page_view") {
    import spark.implicits._
    val out = Pipelines.pageViews(fixture.toDF())
      .orderBy("window_start", "page").collect()
    // three page_view events in two distinct (window, page) buckets at :00
    assert(out.map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3))).toSeq ==
      Seq(("2024-01-01 00:00:00.0", "/", 2L), ("2024-01-01 00:00:00.0", "/cart", 1L)))
  }

  test("sessions: rollup with deterministic event-time-ordered journeys") {
    import spark.implicits._
    val out = Pipelines.sessions(fixture.toDF()).orderBy("session_id").collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getString(0) == "s1" && s1.getLong(4) == 3)
    assert(s1.getAs[String]("pages_visited") == "/,/cart,/payment")
    assert(s1.getAs[String]("event_types") == "page_view,page_view,purchase")
    assert(s1.getTimestamp(2).toString == "2024-01-01 00:00:10.0")
    assert(s1.getTimestamp(3).toString == "2024-01-01 00:01:10.0")
  }

  test("conversions: hourly revenue with exact distinct buyers") {
    import spark.implicits._
    val out = Pipelines.conversions(fixture.toDF(), exactDistinct = true).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(2) == 2L)             // purchase_count
    assert(r.getDouble(3) == 150.5)        // total_revenue (exact decimal path)
    assert(r.getLong(4) == 2L)             // unique_buyers
  }

  test("deviceStats: nested-struct grouping keys") {
    import spark.implicits._
    val out = Pipelines.deviceStats(fixture.toDF(), exactDistinct = true).collect()
    assert(out.forall(_.getAs[String]("device_type") == "desktop"))
    assert(out.map(_.getAs[Long]("visit_count")).sum == 6L)
  }

  test("sessionsWindowed: session_window splits on the gap") {
    import spark.implicits._
    // user 2: events 130s apart → one 10-min session; with a 1-min gap → two
    val wide = Pipelines.sessionsWindowed(fixture.toDF(), gap = "10 minutes")
      .filter(col("session_id") === "s2").collect()
    assert(wide.length == 1 && wide(0).getAs[Long]("event_count") == 2)
    val tight = Pipelines.sessionsWindowed(fixture.toDF(), gap = "1 minute")
      .filter(col("session_id") === "s2").collect()
    assert(tight.length == 2)
  }

  test("sessionsWindowed merge boundary is CLOSED: an exact-gap event still merges") {
    // Pinned EMPIRICALLY (Spark 4.1): an event at exactly prev.ts + gap
    // merges into the session — the island break is diff > gap, not ≥.
    // This is the seam the ev_session_windows oracle encodes; the sf0.1
    // fixture has exactly one such truncated gap and the driver hash
    // only matches under the closed-end rule. If a Spark upgrade flips
    // this semantic, this test fails before the driver row does.
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val rows = Seq(
      ("u1", 1L, at(0)), ("u1", 1L, at(600)),
      ("u1", 1L, at(600 + 1800)),          // exactly gap after → merges
      ("u1", 1L, at(600 + 1800 + 1801)))   // gap + 1s after → new session
      .toDF("session_id", "user_id", "timestamp")
    val got = Pipelines.sessionsWindowed(rows, gap = "30 minutes")
      .collect().map(r => r.getAs[Long]("event_count")).sorted
    assert(got.toSeq == Seq(1L, 3L), s"got ${got.toSeq}")
  }

  test("sessionsWindowed emits the identical session set to batch gap-split") {
    // batch/stream unification for sessions: session_window with a
    // 30-minute gap over the events fixture must produce EXACTLY the
    // session set of the batch lag/cumsum sessionization that the
    // ev_sessionized oracle hash-checks. (The two differ only on events
    // at an exact 30:00.000000 gap — where session_window still MERGES
    // (closed end, pinned above) but ev_sessionized's > 1800 rule also
    // merges, so the sets agree; the fixture has none regardless.)
    import spark.implicits._
    val ev = graft.source.Tables.events(spark, sfDir)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id").cast("long"),
        date_trunc("second", col("session_start")).cast("long"),
        date_trunc("second", col("session_end")).cast("long"),
        col("event_count").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val windowed = key(Pipelines.sessionsWindowed(
      ev.select(col("ts").as("timestamp"), col("user_id").as("session_id"),
        col("user_id")),
      gap = "30 minutes", watermark = "30 minutes"))
    val batch = key(graft.SparkEntry.queries("ev_sessionized")(spark, sfDir)
      .select(col("user_id"), col("sess_start").as("session_start"),
        col("sess_end").as("session_end"), col("n_events").as("event_count")))
    assert(windowed == batch,
      s"missing=${(batch -- windowed).take(3)} extra=${(windowed -- batch).take(3)}")
    assert(windowed.nonEmpty)
  }

  test("streaming twin: pageViews over MemoryStream equals the batch run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = ClickstreamGen.events(spark, 300, numPartitions = 2).collect().toSeq
    val stream = MemoryStream[ClickstreamEvent]
    val q = Pipelines.pageViews(stream.toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("pv_stream").start()
    try {
      stream.addData(evs)
      q.processAllAvailable()
      val streamed = spark.table("pv_stream")
        .orderBy("window_start", "page")
        .collect().map(_.toSeq).toSeq
      val batch = Pipelines.pageViews(evs.toDF())
        .orderBy("window_start", "page")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming parity: sessionsWindowed append-mode prefixes ≡ batch run") {
    // SURVEY §7.4.2 end-to-end (VERDICT r8 #7): the session_window
    // streaming form, fed the same events in event-time-ordered
    // micro-batch prefixes, must FINALIZE (append-mode emit, state
    // dropped) exactly the session set the batch form computes — the
    // prefix-absorb pattern the CMS/MG streaming twins use. A flush
    // event far past the last real timestamp advances the watermark so
    // every session closes; only that sentinel is excluded from the
    // comparison.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = ClickstreamGen.events(spark, 400, numPartitions = 2).collect().toSeq
      .sortBy(_.timestamp.getTime)
    val stream = MemoryStream[ClickstreamEvent]
    val q = Pipelines.sessionsWindowed(stream.toDF(),
        gap = "1 minute", watermark = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("sw_stream").start()
    try {
      evs.grouped(97).foreach { chunk =>
        stream.addData(chunk: _*)
        q.processAllAvailable()
      }
      val flush = evs.last.copy(session_id = "s-flush",
        timestamp = new Timestamp(evs.map(_.timestamp.getTime).max + 3600L * 1000))
      stream.addData(flush)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), Option(r.get(1)), r.getTimestamp(2).getTime,
          r.getTimestamp(3).getTime, r.getLong(4))
      val streamed = spark.table("sw_stream")
        .filter(col("session_id") =!= "s-flush")
        .collect().map(key).toSet
      val batch = Pipelines.sessionsWindowed(evs.toDF(), gap = "1 minute")
        .collect().map(key).toSet
      assert(streamed == batch,
        s"streaming finalized ${streamed.size} sessions, batch ${batch.size}; " +
          s"diff=${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
      assert(batch.size > evs.map(_.session_id).distinct.size / 2,
        "degenerate fixture: gap never split or merged anything")
    } finally q.stop()
  }

  test("watermark drops events later than the delay in update mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ClickstreamEvent]
    val q = Pipelines.pageViews(stream.toDF(), watermark = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("pv_late").start()
    try {
      stream.addData(ev(1, "s1", "2024-01-01 00:00:10", "/", "page_view"))
      q.processAllAvailable()
      // advance event time far beyond the watermark, closing the first window
      stream.addData(ev(1, "s1", "2024-01-01 00:10:00", "/", "page_view"))
      q.processAllAvailable()
      // this event is > 1 minute late: must be dropped from state
      stream.addData(ev(9, "s9", "2024-01-01 00:00:20", "/", "page_view"))
      q.processAllAvailable()
      val done = spark.table("pv_late").collect()
      val first = done.filter(_.getTimestamp(0).toString == "2024-01-01 00:00:00.0")
      assert(first.length == 1 && first(0).getLong(3) == 1L,
        s"late event must not revise the closed window: ${done.mkString(";")}")
    } finally q.stop()
  }
}
