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

  test("intervalOverlapJoin ≡ plain inequality join on random intervals, no duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // interval lengths straddle the cell size (100): some inside one
    // cell, some spanning many — the duplicate-risk regime
    val ls = (1L to 60L).map { id =>
      val s = rnd.nextInt(2000).toLong; (id, s, s + rnd.nextInt(350)) }
    val rs = (1L to 60L).map { id =>
      val s = rnd.nextInt(2000).toLong; (id, s, s + rnd.nextInt(350)) }
    val want = (for {
      (li, lsv, lev) <- ls; (ri, rsv, rev) <- rs
      if lsv <= rev && rsv <= lev
    } yield (li, ri)).toSet
    for (cell <- Seq(50L, 100L, 1000L); parts <- Seq(1, 5)) {
      val out = RangeJoin.intervalOverlapJoin(
          ls.toDF("l_id", "ls", "le").repartition(parts),
          rs.toDF("r_id", "rs", "re"),
          "ls", "le", "rs", "re", cellSec = cell)
        .select(col("l_id"), col("r_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.length == out.toSet.size, s"cell=$cell: duplicate pairs")
      assert(out.toSet == want, s"cell=$cell parts=$parts: pair sets differ")
    }
  }

  test("intervalOverlapJoin: touching endpoints count as overlap; key isolation") {
    import spark.implicits._
    val l = Seq((1L, "A", 100L, 200L), (2L, "B", 100L, 200L)).toDF("l_id", "k", "ls", "le")
    val r = Seq((10L, "A", 200L, 300L), // touches at 200 → overlap
                (11L, "A", 201L, 300L), // disjoint
                (12L, "B", 150L, 160L)) // contained, other key
      .toDF("r_id", "k", "rs", "re")
    val out = RangeJoin.intervalOverlapJoin(l, r, "ls", "le", "rs", "re",
        cellSec = 60L, by = Seq("k"))
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 12L)), s"got $out")
  }
}
