package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("lastPriorJoin: latest prior match per key, inclusive at equal ts, null when none") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, quote_id)
      ("A", "2024-01-01 00:00:10", 1L),
      ("A", "2024-01-01 00:00:30", 2L),
      ("B", "2024-01-01 00:00:20", 3L))
      .map { case (k, t, q) => (k, Timestamp.valueOf(t), q) }
      .toDF("key", "ts", "quote_id")
    val trades = Seq( // (key, ts, trade_id)
      ("A", "2024-01-01 00:00:05", 10L), // before any quote → null
      ("A", "2024-01-01 00:00:30", 11L), // equal ts → inclusive match (2)
      ("A", "2024-01-01 00:00:59", 12L), // latest prior = 2
      ("B", "2024-01-01 00:00:25", 13L), // → 3
      ("C", "2024-01-01 00:00:25", 14L)) // key with no quotes → null
      .map { case (k, t, q) => (k, Timestamp.valueOf(t), q) }
      .toDF("key", "ts", "trade_id")

    val out = AsOf.lastPriorJoin(trades, quotes, Seq("key"), "ts", "ts", Seq("quote_id"))
      .select(col("trade_id"), col("asof.quote_id").as("q"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(10L -> -1L, 11L -> 2L, 12L -> 2L, 13L -> 3L, 14L -> -1L))
  }

  test("null right timestamps never match (phantom-carry guard)") {
    import spark.implicits._
    val left = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:01"), 1L))
      .toDF("key", "ts", "id")
    val right = Seq(("A", null.asInstanceOf[Timestamp], 99L))
      .toDF("key", "ts", "rid")
    val out = AsOf.lastPriorJoin(left, right, Seq("key"), "ts", "ts", Seq("rid"))
    assert(out.count() == 1)
    assert(out.select(col("asof")).collect()(0).isNullAt(0))
  }

  test("output keeps every left row and all left columns") {
    import spark.implicits._
    val left = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:01"), "x"))
      .toDF("key", "ts", "extra")
    val right = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:00"), 7L))
      .toDF("key", "ts", "rid")
    val out = AsOf.lastPriorJoin(left, right, Seq("key"), "ts", "ts", Seq("rid"))
    assert(out.columns.toSeq == Seq("key", "ts", "extra", "asof"))
    assert(out.count() == 1)
    assert(out.select(col("asof.rid")).collect()(0).getLong(0) == 7L)
  }
}
