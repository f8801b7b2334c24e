package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (seq, key, op, val) — out-of-order arrival, hot key, tombstones
  private def log(parts: Int) = {
    import spark.implicits._
    Seq(
      (5L, 1L, "U", "e"), (1L, 1L, "I", "a"), (3L, 1L, "U", "c"),
      (2L, 1L, "U", "b"), (4L, 1L, "D", "-"),          // key 1: delete then update → survives as "e"
      (2L, 2L, "D", "-"), (1L, 2L, "I", "x"),          // key 2: last is delete → absent
      (1L, 3L, "I", "only"),                           // key 3: single insert
      (7L, 4L, "D", "-"), (6L, 4L, "U", "y"), (5L, 4L, "I", "z")
    ).toDF("seq", "key", "op", "v").repartition(parts)
  }

  test("applyChangelog: last writer wins, tombstones delete, no resurrection") {
    val out = Cdc.applyChangelog(log(4), keys = Seq("key"),
        ordering = Seq("seq"), isDelete = col("op") === "D")
      .select("key", "v").collect().map(r => r.getLong(0) -> r.getString(1))
      .sortBy(_._1)
    assert(out.toSeq == Seq(1L -> "e", 3L -> "only"),
      s"got ${out.toSeq}") // 2 and 4 end on tombstones
  }

  test("applyChangelog: ≡ window formulation, partition-invariant") {
    for (parts <- Seq(1, 3, 8)) {
      val df = log(parts)
      val got = Cdc.applyChangelog(df, Seq("key"), Seq("seq"),
          col("op") === "D")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      val w = Window.partitionBy(col("key")).orderBy(col("seq").desc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D").drop("rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      assert(got == want, s"diverged from window formulation at $parts partitions")
    }
  }

  test("applyChangelog: composite ordering breaks ts ties deterministically") {
    import spark.implicits._
    val df = Seq(
      (ts(10), 1L, 1L, "first"), (ts(10), 2L, 1L, "second"), // same ts, seq tiebreak
      (ts(9), 9L, 1L, "older-ts-higher-seq")
    ).toDF("t", "seq", "key", "v")
    val out = Cdc.applyChangelog(df, Seq("key"), Seq("t", "seq"),
        lit(false)).select("v").collect().map(_.getString(0))
    assert(out.toSeq == Seq("second"))
  }

  test("applyChangelog plan: aggregate, not a window sort") {
    val plan = Cdc.applyChangelog(log(4), Seq("key"), Seq("seq"),
      col("op") === "D").queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan, got:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      "changelog apply must not plan a window sort over the full feed")
  }
}
