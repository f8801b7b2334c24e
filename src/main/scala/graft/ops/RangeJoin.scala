package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join: pair each left row with the right rows of the same key
  * whose timestamp falls in `(leftTs, leftTs + windowSec]`.
  *
  * A naive inequality join plans as a nested-loop (per key: |L|·|R|). This
  * implementation bucketizes time by the window length: each right row
  * lands in exactly one bucket, each left row probes its own bucket and
  * the next one (any interval of length W overlaps at most two W-aligned
  * buckets), so the join is EQUI on (key, bucket) — shuffle-partitionable,
  * AQE-skew-splittable — with the exact range predicate as a cheap
  * post-filter. Cost: |L|·2 + |R| shuffled rows, never |L|·|R|.
  */
object RangeJoin {

  def timeRangeJoin(left: DataFrame, right: DataFrame, by: Seq[String],
                    leftTs: String, rightTs: String, windowSec: Long,
                    leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val bucketOf = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c) / windowSec)
    val l = left.select(
      (by.map(col) ++ leftCols.map(c => col(c).as(s"l_$c")) :+
        col(leftTs).as("__lts")): _*)
      .withColumn("__bucket", explode(array(bucketOf(col("__lts")),
        bucketOf(col("__lts")) + 1)))
    val r = right.select(
      (by.map(col) ++ rightCols.map(c => col(c).as(s"r_$c")) :+
        col(rightTs).as("__rts")): _*)
      .withColumn("__bucket", bucketOf(col("__rts")))
    l.join(r, by :+ "__bucket")
      .filter(col("__rts") > col("__lts") &&
        col("__rts") <= col("__lts") + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("__bucket")
  }
}
