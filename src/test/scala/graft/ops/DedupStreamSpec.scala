package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.model.{ClickstreamEvent, Device}

class DedupStreamSpec extends SparkSpec {

  private def ev(id: String, ts: String): ClickstreamEvent =
    ClickstreamEvent(Some(1), "s", Timestamp.valueOf(ts), "/", "purchase",
      "direct", Device("d", "b", "o"), "ip", "ua", None, None, None, None,
      Some(id), Some(1.0))

  test("streaming dedup within watermark: duplicates suppressed, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ClickstreamEvent]
    val q = Pipelines.dedup(stream.toDF(), Seq("order_id"), watermark = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      stream.addData(ev("o1", "2024-01-01 00:00:10"), ev("o1", "2024-01-01 00:00:20"))
      q.processAllAvailable()
      stream.addData(ev("o2", "2024-01-01 00:00:30"), ev("o1", "2024-01-01 00:00:40"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getAs[String]("order_id"))
      assert(ids.sorted.toSeq == Seq("o1", "o2"), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("batch dedup: same transform degrades to dropDuplicates") {
    import spark.implicits._
    val df = Seq(ev("o1", "2024-01-01 00:00:10"), ev("o1", "2024-01-01 00:05:00"),
      ev("o2", "2024-01-01 00:00:30")).toDF()
    assert(Pipelines.dedup(df, Seq("order_id")).count() == 2)
  }
}
