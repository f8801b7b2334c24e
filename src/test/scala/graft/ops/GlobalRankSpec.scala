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

  test("withGlobalPrefixSum equals the partitionless window sum on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = rnd.shuffle((1 to 400).map(i => (i.toLong, rnd.nextInt(50).toLong)))
    val df = rows.toDF("id", "w")
    Seq(1, 3, 8).foreach { parts =>
      val fast = GlobalRank.withGlobalPrefixSum(df, Seq(col("id")), col("w"),
          out = "ps", numPartitions = Some(parts))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val slow = df.withColumn("ps",
          sum(col("w")).over(Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(fast == slow, s"parts=$parts")
    }
  }

  test("ppsSample: crossing count, long-doc certainty, ≡ sequential reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // lengths straddle the step: shorts sampled ∝ length, longs certain
    val docs = (1L to 300L).map { id =>
      val len = if (id % 37 == 0) 120 + rnd.nextInt(80) else 1 + rnd.nextInt(40)
      (id, Seq.fill(len)("w").mkString(" "))
    }
    val step = 100L
    val out = graft.text.Text.ppsSample(
        docs.toDF("doc_id", "text").repartition(5), step)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential reference walk
    var cum = 0L
    val want = docs.flatMap { case (id, text) =>
      val n = text.split("\\s+").length.toLong
      val before = cum; cum += n
      if (cum / step > before / step) Some((id, n, cum)) else None
    }
    assert(out.sortBy(_._1).toSeq == want, "≡ sequential crossing walk")
    // every step-multiple ≤ total is crossed by exactly one kept doc (a
    // long doc may absorb several), so crossings sum to total div step
    val total = docs.map(_._2.split("\\s+").length.toLong).sum
    val crossings = out.map { case (_, n, cum) => cum / step - (cum - n) / step }.sum
    assert(crossings == total / step, s"crossings $crossings != ${total / step}")
    // every document of ≥ step tokens crosses at least one multiple
    val longIds = docs.filter(_._2.split("\\s+").length >= step).map(_._1).toSet
    assert(longIds.subsetOf(out.map(_._1).toSet), "long docs kept with certainty")
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

  test("packSequences ≡ sequential concat-and-split reference, any partitioning") {
    val budget = 64
    val docs = graft.source.Tables(spark, sfDir, "documents")
    // sequential reference: walk docs in id order, carry the stream offset
    val ref = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").length.toLong))
      .sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, excl), (id, n)) => (id, n, excl + n) }
      .drop(1) // (id, n, INCLUSIVE sum)
      .map { case (id, n, incl) =>
        val excl = incl - n
        id -> (n, excl / budget, excl % budget,
          (excl + n - 1) / budget - excl / budget + 1)
      }.toMap
    for (parts <- Seq(1, 7)) {
      val got = graft.text.Text.packSequences(docs.repartition(parts), budget)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == ref, s"parts=$parts")
    }
    // invariants: offsets inside the budget; spans consistent
    ref.values.foreach { case (n, _, off, span) =>
      assert(off >= 0 && off < budget)
      assert(span >= 1 && span <= n / budget + 2)
    }
  }
}
