package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering.
  *
  * `row_number().over(Window.orderBy(...))` with no partition key pulls
  * the ENTIRE dataset through one task — the canonical global-rank
  * scale-killer (Spark even warns `No Partition Defined for Window
  * operation`). The two-pass alternative here stays parallel at any
  * scale:
  *
  *  1. range-repartition by the sort key (Spark samples the key
  *     distribution, so partitions are balanced AND partition p's keys
  *     all precede partition p+1's in the requested order);
  *  2. rank within each partition — a window PARTITIONED by the physical
  *     partition id, so every task ranks only its own slice;
  *  3. add per-partition row-count offsets — a driver-side cumulative
  *     sum over ≤ numPartitions longs (the bounded-collect class).
  *
  * The result is the exact global row number for any TOTAL order: offsets
  * plus local ranks reproduce the global rank regardless of where the
  * sampled range boundaries fall. Callers must make the order total
  * (include a unique tiebreaker column) or ranks within ties are
  * partition-placement-dependent.
  *
  * The ranged frame is persisted for the two passes (counts, then ranks)
  * because range partitioning re-samples per action — re-computing could
  * place boundary rows differently between the passes.
  */
object GlobalRank {

  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
                          out: String = "row_num",
                          numPartitions: Option[Int] = None): DataFrame =
    withGlobalRowNumberCounted(df, order, out, numPartitions)._1

  /** [[withGlobalRowNumber]] plus the TOTAL row count, which the offset
    * pass already holds on the driver (the last cumulative offset) —
    * callers that need N (decile arithmetic, sampling rates) otherwise
    * pay a whole extra aggregation pass plus a 1-row broadcast join for
    * a number this computation produced for free.
    */
  def withGlobalRowNumberCounted(df: DataFrame, order: Seq[Column],
                                 out: String = "row_num",
                                 numPartitions: Option[Int] = None): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = (0 until parts).scanLeft(0L) {
        (acc, p) => acc + counts.getOrElse(p, 0L)
      }
      // offset lookup as a literal array indexed by pid: no join, no
      // broadcast plumbing — ≤ numPartitions longs baked into the plan
      val offsetArr = array(offsets.take(parts).map(lit): _*)
      val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      val ranked = ranged
        .withColumn(out, element_at(offsetArr, col("__pid") + 1) +
          row_number().over(w))
        .drop("__pid")
      // The returned plan still reads the persisted frame lazily; leave
      // the handle to Spark's LRU (bounded: one ranged copy per call).
      // Even under eviction the ranks stay correct: the range sampler is
      // deterministically seeded, so a recompute reproduces the same
      // boundaries the offsets were computed from.
      (ranked, offsets(parts))
    } catch { case t: Throwable => ranged.unpersist(); throw t }
  }

  /** Distributed global WEIGHTED prefix sum over a total order — the
    * generalization of [[withGlobalRowNumber]] from counts to weights
    * (row number is the weight-1 case). Same two-pass discipline: range-
    * repartition on the order, per-partition weight totals offset a
    * within-partition running sum, so no task ever windows more than its
    * own slice and the driver holds ≤ numPartitions longs.
    *
    * `out` is the INCLUSIVE prefix sum (this row's weight included) of
    * the integer `weight` column along `order`. Callers must make the
    * order total (unique tiebreaker) — same contract as row numbering.
    */
  def withGlobalPrefixSum(df: DataFrame, order: Seq[Column], weight: Column,
                          out: String = "prefix_sum",
                          numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val ranged = df.withColumn("__w", weight.cast("long"))
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sums = ranged.groupBy(col("__pid")).agg(sum(col("__w")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = (0 until parts).scanLeft(0L) {
        (acc, p) => acc + sums.getOrElse(p, 0L)
      }
      val offsetArr = array(offsets.take(parts).map(lit): _*)
      val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // The returned plan reads the persisted frame lazily, so the cache
      // entry is INTENTIONALLY left to Spark's LRU — same contract as
      // withGlobalRowNumber (bounded: one ranged copy per call; under
      // eviction the deterministic range sampler reproduces the same
      // boundaries the offsets were computed from, so results stay
      // correct). An eager unpersist here would recompute the ranged
      // frame on the caller's first action with re-sampled boundaries.
      ranged
        .withColumn(out, element_at(offsetArr, col("__pid") + 1) +
          sum(col("__w")).over(w))
        .drop("__pid", "__w")
    } catch { case t: Throwable => ranged.unpersist(); throw t }
  }
}
