package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.model.{ClickstreamEvent, Device}

class SessionsStatefulSpec extends SparkSpec {

  private def ev(session: String, ts: String, page: String): ClickstreamEvent =
    ClickstreamEvent(Some(7), session, Timestamp.valueOf(ts), page, "page_view",
      "direct", Device("d", "b", "o"), "ip", "ua", None, None, None, None, None, None)

  test("flatMapGroupsWithState closes sessions once the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ClickstreamEvent]
    val q = Pipelines.sessionsStateful(stream.toDS(), gapMs = 60000L, watermark = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_stateful").start()
    try {
      stream.addData(
        ev("s1", "2024-01-01 00:00:10", "/"),
        ev("s1", "2024-01-01 00:00:40", "/cart"))
      q.processAllAvailable()
      // session still open: nothing emitted yet
      assert(spark.table("sessions_stateful").count() == 0)

      // advance event time well past s1's end + gap + watermark
      stream.addData(ev("s2", "2024-01-01 00:30:00", "/about"))
      q.processAllAvailable()
      stream.addData(ev("s2", "2024-01-01 00:31:00", "/"))
      q.processAllAvailable()

      val closed = spark.table("sessions_stateful").as[ClosedSession].collect()
      assert(closed.map(_.session_id).toSeq == Seq("s1"))
      val s1 = closed.head
      assert(s1.event_count == 2)
      assert(s1.pages_visited == "/,/cart") // event-time order preserved
      assert(s1.session_start.toString == "2024-01-01 00:00:10.0")
      assert(s1.session_end.toString == "2024-01-01 00:00:40.0")
    } finally q.stop()
  }
}
