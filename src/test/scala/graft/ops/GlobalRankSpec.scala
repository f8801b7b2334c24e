package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-pass distributed global row numbering must equal the
  * single-task window's answer exactly — that is its entire contract.
  */
class GlobalRankSpec extends SparkSpec {

  test("withGlobalRowNumber equals the partitionless window on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate-heavy keys force the total-order tiebreak to matter, and
    // ids arrive shuffled so physical input order ≠ rank order
    val rows = rnd.shuffle((1 to 400).map(i => (i.toLong, rnd.nextInt(20))))
    val df = rows.toDF("id", "k")
    Seq(1, 3, 8).foreach { parts =>
      val fast = GlobalRank.withGlobalRowNumber(df,
          Seq(col("k").desc, col("id")), out = "rn", numPartitions = Some(parts))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val slow = df.withColumn("rn",
          row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(fast == slow, s"parts=$parts")
    }
  }

  test("shardAssign balances token totals across shards (snake deal)") {
    val docs = graft.source.Tables(spark, sfDir, "documents")
    val n = 8
    val out = graft.text.Text.shardAssign(docs, nShards = n)
    val totals = out.groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals.keySet == (0L until n.toLong).toSet)
    // snake over size-desc ranks: adjacent shards differ by at most one
    // document's tokens per pass; on any real corpus the spread is tiny
    val (mx, mn) = (totals.values.max, totals.values.min)
    assert(mx - mn <= mx / 10, s"unbalanced: $totals")
    // assignment is deterministic across reruns
    val again = graft.text.Text.shardAssign(docs, nShards = n)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == first)
  }
}
