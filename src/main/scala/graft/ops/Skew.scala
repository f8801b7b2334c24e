package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * A hash aggregation over a key set with heavy hitters sends every row of
  * the hot key to one reduce task. Salting splits each hot key across
  * `saltBuckets` sub-keys for a partial aggregate, then re-aggregates the
  * (tiny) salted partials — two shuffles, but the big one is balanced.
  * AQE's skew-join handling covers joins; this covers aggregations, where
  * AQE does not rebalance.
  */
object Skew {

  /** Salted two-stage aggregation.
    *
    * @param aggs   (partialAgg, finalAgg) column pairs — e.g.
    *               `(sum(col("x")).as("s"), sum(col("s")).as("s"))` — the
    *               final agg must re-aggregate the partial's output column.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    // The salt must be DETERMINISTIC per row: order-dependent salts
    // (monotonically_increasing_id, rand, spark_partition_id) re-salt rows
    // differently when a map task is recomputed after a fetch failure,
    // silently corrupting the re-aggregation (SPARK-23207-class bug).
    // Hashing the full row content is stable under recompute; rows that
    // are bytewise identical share a bucket, which only matters if a hot
    // key's rows are literally indistinguishable.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }

  /** Convenience: salted count per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      Seq(count(lit(1)).as("partial_n")),
      Seq(sum(col("partial_n")).as("n")))

  /** Convenience: salted exact sum of a 2-dp measure (decimal path). */
  def saltedSum(df: DataFrame, keys: Seq[String], measure: String,
                saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      Seq(sum(col(measure).cast("decimal(18,2)")).as("partial_s")),
      Seq(sum(col("partial_s")).cast("double").as("total")))
}
