package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{ClickstreamEvent, Device}

class StreamJoinSpec extends SparkSpec {

  private def ev(user: Int, ts: String, page: String, et: String): ClickstreamEvent =
    ClickstreamEvent(Some(user), s"s$user", Timestamp.valueOf(ts), page, et,
      "direct", Device("d", "b", "o"), "ip", "ua", None, None, None, None,
      if (et == "purchase") Some(s"o-$user-$ts") else None,
      if (et == "purchase") Some(10.0) else None)

  test("stream-stream join attributes purchases to in-window views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[ClickstreamEvent]
    val vStream = MemoryStream[ClickstreamEvent]
    val q = Pipelines.streamingAttribution(pStream.toDF(), vStream.toDF(),
        windowSec = 600L, watermark = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("attribution").start()
    try {
      vStream.addData(
        ev(1, "2024-01-01 00:00:10", "/product", "page_view"),
        ev(2, "2024-01-01 00:00:20", "/other", "page_view"))
      pStream.addData(
        ev(1, "2024-01-01 00:05:00", "/payment", "purchase"), // within 10 min of view
        ev(3, "2024-01-01 00:05:00", "/payment", "purchase")) // no view at all
      q.processAllAvailable()
      // advance both watermarks so results finalize
      vStream.addData(ev(9, "2024-01-01 01:00:00", "/x", "page_view"))
      pStream.addData(ev(9, "2024-01-01 01:00:00", "/payment", "purchase"))
      q.processAllAvailable()

      val rows = spark.table("attribution")
        .select(col("p_user"), col("view_page")).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(rows.contains((1, "/product")))
      assert(!rows.exists(_._1 == 3)) // inner join: unattributed drops
      // user 2's view matched no purchase
      assert(!rows.exists(_._2 == "/other"))
    } finally q.stop()
  }

  test("stream-static enrichment joins a streaming fact to a batch dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("/product", "catalog"), ("/payment", "checkout"))
      .toDF("page", "section")
    val stream = MemoryStream[ClickstreamEvent]
    val q = stream.toDF()
      .join(broadcast(dim), Seq("page"), "left") // static side broadcast
      .select(col("page"), col("section"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    try {
      stream.addData(ev(1, "2024-01-01 00:00:10", "/product", "page_view"),
        ev(1, "2024-01-01 00:00:20", "/unknown", "page_view"))
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(got == Set("/product" -> Some("catalog"), "/unknown" -> None))
    } finally q.stop()
  }
}
