package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("timeRangeJoin: (lts, lts+W] window, cross-bucket matches, key isolation") {
    import spark.implicits._
    def df(rows: (String, String, Long)*) =
      rows.map { case (k, t, id) => (k, Timestamp.valueOf(t), id) }
        .toDF("key", "ts", "id")
    val left = df(("A", "2024-01-01 00:00:30", 1L), ("B", "2024-01-01 00:00:00", 2L))
    val right = df(
      ("A", "2024-01-01 00:00:30", 10L), // == lts → excluded (strict >)
      ("A", "2024-01-01 00:00:31", 11L), // in window, same bucket
      ("A", "2024-01-01 00:01:25", 12L), // in window, NEXT minute bucket
      ("A", "2024-01-01 00:01:30", 13L), // == lts + W → included (inclusive)
      ("A", "2024-01-01 00:01:31", 14L), // past window → excluded
      ("B", "2024-01-01 00:00:31", 15L)) // other key
    val out = RangeJoin.timeRangeJoin(left, right, Seq("key"), "ts", "ts",
        windowSec = 60L, leftCols = Seq("id"), rightCols = Seq("id"))
      .select(col("l_id"), col("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 11L), (1L, 12L), (1L, 13L), (2L, 15L)), s"got $out")
  }

  test("no duplicate pairs from the two-bucket probe") {
    import spark.implicits._
    val left = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("key", "ts", "id")
    val right = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:30"), 2L))
      .toDF("key", "ts", "id")
    val n = RangeJoin.timeRangeJoin(left, right, Seq("key"), "ts", "ts", 60L,
      Seq("id"), Seq("id")).count()
    assert(n == 1)
  }
}
