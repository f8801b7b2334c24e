package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def snap(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("k", "attr", "d")
      .select(col("k"), col("attr"), to_timestamp(col("d")).as("eff"))
  }

  private def collectHist(df: DataFrame): Seq[(Long, String, Timestamp, Option[Timestamp], Boolean)] =
    df.orderBy("k", "valid_from").collect().toSeq.map(r =>
      (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))

  test("no-op redeliveries collapse; spans chain; open row is NULL-terminated") {
    val s = snap(
      (1L, "a", "2024-01-01"), (1L, "a", "2024-02-01"), (1L, "b", "2024-03-01"),
      (2L, "x", "2024-01-01"))
    val hist = collectHist(Scd2.fromSnapshots(s, Seq("k"), "eff", Seq("attr")))
    assert(hist == Seq(
      (1L, "a", ts("2024-01-01"), Some(ts("2024-03-01")), false),
      (1L, "b", ts("2024-03-01"), None, true),
      (2L, "x", ts("2024-01-01"), None, true)))
  }

  test("merge of a change batch ≡ full rebuild over all deliveries") {
    val d0 = snap((1L, "a", "2024-01-01"), (2L, "x", "2024-01-01"), (3L, "p", "2024-01-01"))
    val d1 = snap((1L, "b", "2024-02-01"), (3L, "p", "2024-02-01")) // 3 is a no-op
    val d2 = snap((1L, "c", "2024-03-01"), (2L, "y", "2024-03-01"))
    val rebuilt = Scd2.fromSnapshots(
      d0.unionByName(d1).unionByName(d2), Seq("k"), "eff", Seq("attr"))
    val merged = Scd2.merge(
      Scd2.merge(Scd2.fromSnapshots(d0, Seq("k"), "eff", Seq("attr")),
        d1, Seq("k"), "eff", Seq("attr")),
      d2, Seq("k"), "eff", Seq("attr"))
    assert(collectHist(merged) == collectHist(rebuilt))
  }

  test("fromSnapshots is one exchange: both window passes share the key partitioning") {
    val s = snap((1L, "a", "2024-01-01"), (1L, "b", "2024-02-01"))
    val plan = Scd2.fromSnapshots(s, Seq("k"), "eff", Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single hash exchange, plan:\n$plan")
  }

  test("merge re-windows only touched keys: untouched history takes the anti-join branch") {
    val d0 = snap((1L, "a", "2024-01-01"), (2L, "x", "2024-01-01"))
    val hist = Scd2.fromSnapshots(d0, Seq("k"), "eff", Seq("attr"))
    val change = snap((1L, "b", "2024-02-01"))
    val plan = Scd2.merge(hist, change, Seq("k"), "eff", Seq("attr"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"pass-through branch missing:\n$plan")
    // the full-history frame must not feed a Window directly — only the
    // semi-joined open subset does
    assert(plan.contains("LeftSemi"), plan)
  }

  test("attribute NULLs: null→value and value→null are real changes; null→null is a no-op") {
    import spark.implicits._
    val s = Seq(
      (1L, Option.empty[String], "2024-01-01"),
      (1L, Option.empty[String], "2024-02-01"),
      (1L, Option("v"), "2024-03-01"),
      (1L, Option.empty[String], "2024-04-01"))
      .toDF("k", "attr", "d")
      .select(col("k"), col("attr"), to_timestamp(col("d")).as("eff"))
    val hist = Scd2.fromSnapshots(s, Seq("k"), "eff", Seq("attr"))
      .orderBy("valid_from").collect()
    assert(hist.length == 3)
    assert(hist.map(_.getTimestamp(2)).toSeq ==
      Seq(ts("2024-01-01"), ts("2024-03-01"), ts("2024-04-01")))
  }
}
