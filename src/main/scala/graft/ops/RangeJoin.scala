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

  /** INTERVAL × INTERVAL overlap join (closed intervals:
    * `lStart ≤ rEnd AND rStart ≤ lEnd`) — the general form
    * [[timeRangeJoin]]'s point-in-range is a special case of: sessions ×
    * campaign windows, builds × incident windows, any two validity
    * ranges.
    *
    * The inequality pair plans as a nested loop; this implementation
    * makes it EQUI: time is quantized into `cellSec` cells, each
    * interval explodes to the cells it covers, the join runs on
    * (`by`…, cell), and the exact overlap predicate post-filters. A pair
    * overlapping several shared cells would duplicate, so each pair is
    * kept ONLY at its overlap's first cell —
    * `cell = max(⌊lStart/c⌋, ⌊rStart/c⌋)` (floor commutes with max, and
    * the overlap start lies in both spans) — which de-duplicates WITHOUT
    * a distinct shuffle. Cost: Σ(len/cell + 1) exploded rows per side,
    * shuffle-partitionable and AQE-skew-splittable; pick `cellSec` near
    * the typical interval length so most intervals emit ~2 cells.
    *
    * Interval bounds are epoch-second LONG columns (exact integer
    * arithmetic end-to-end — the oracle-determinism contract); the two
    * inputs' other column names must be disjoint.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          cellSec: Long, by: Seq[String] = Nil): DataFrame = {
    require(cellSec > 0, "cellSec must be positive")
    def cells(s: String, e: String) =
      explode(sequence(expr(s"$s div ${cellSec}L"), expr(s"$e div ${cellSec}L")))
    val l = left.withColumn("__cell", cells(lStart, lEnd))
    val r = right.withColumn("__cell", cells(rStart, rEnd))
    l.join(r, by :+ "__cell")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__cell") ===
        greatest(expr(s"$lStart div ${cellSec}L"), expr(s"$rStart div ${cellSec}L")))
      .drop("__cell")
  }
}
