package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row whose
  * timestamp is ≤ the left row's, within the same key group — the
  * event-attribution / point-in-time-lookup operator Spark lacks as a
  * builtin.
  *
  * Implemented as union + one window pass: tag both sides, sort each key
  * group once by (ts, side), and carry the last-seen right payload forward
  * (`last(..., ignoreNulls)` over unbounded-preceding). Cost is ONE
  * shuffle on the keys and a per-group sort — never the |left|·|right|
  * blow-up of an inequality join, and skew follows the key distribution
  * exactly like any aggregation (salt if needed). At equal timestamps the
  * right row sorts first, so the match is inclusive (right.ts == left.ts
  * matches).
  */
object AsOf {

  /** @param rightPayloadCols columns of `right` surfaced in the output's
    *                         `asof` struct (null when no prior right row).
    */
  def lastPriorJoin(left: DataFrame, right: DataFrame, by: Seq[String],
                    leftTs: String, rightTs: String,
                    rightPayloadCols: Seq[String]): DataFrame = {
    // a null right timestamp can never satisfy rightTs <= leftTs, but it
    // would sort first (nulls-first) and be carried forward as a phantom
    // match — drop such rows up front
    val rightNonNull = right.filter(col(rightTs).isNotNull)
    val rightU = rightNonNull.select(
      (by.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__is_r") :+
        struct(rightPayloadCols.map(col): _*).as("__rp")): _*)
    val leftU = left.select(
      (by.map(col) :+ col(leftTs).as("__ts") :+ lit(0).as("__is_r") :+
        lit(null).cast(rightU.schema("__rp").dataType).as("__rp") :+
        struct(left.columns.map(col): _*).as("__lp")): _*)
    val u = leftU.unionByName(
      rightU.withColumn("__lp", lit(null).cast(leftU.schema("__lp").dataType)))
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__ts"), col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof",
        last(when(col("__is_r") === 1, col("__rp")), ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)
      .select(col("__lp.*"), col("asof"))
  }
}
