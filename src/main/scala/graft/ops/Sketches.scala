package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the heavy-hitter companion to the HLL
  * distinct-count surface (`ev_hll_users`). At 100 TB "top pages / top
  * users" cannot be an exact groupBy when the key domain itself won't fit
  * a reducer's hash table budget per window; the sketch keeps a BOUNDED
  * summary per partition and merges summaries associatively, so the
  * aggregation stays one map-side-combined pass with O(k) state per task
  * regardless of key cardinality.
  *
  * Algorithm: Misra–Gries (Misra & Gries 1982; mergeability per Agarwal
  * et al., "Mergeable Summaries", PODS'12): keep ≤ k counters; a new item
  * either increments its counter, claims a free slot, or decrements ALL
  * counters (dropping zeros). Merge = pointwise counter sum, then subtract
  * the (k+1)-largest combined value and drop non-positives. Guarantees,
  * for stream length N and true frequency f(i):
  *
  *   f(i) − N/(k+1)  ≤  est(i)  ≤  f(i)
  *
  * so every item with f(i) > N/(k+1) is guaranteed present. Estimates
  * (not the guarantee) depend on partitioning/merge order — like HLL the
  * output is engine-side, so the registered query is rows-only checked
  * and `SketchesSpec` verifies the bound against exact counts.
  */
object Sketches {

  /** Misra–Gries summary over LONG keys; buffer and output are the
    * counter map. Decrements are folded lazily: `reduce` does the classic
    * per-item step; `merge` does the summary-sum + (k+1)-th-largest
    * subtraction.
    */
  class MisraGries(k: Int) extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
    require(k >= 1)
    override def zero: Map[Long, Long] = Map.empty

    override def reduce(b: Map[Long, Long], x: Long): Map[Long, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }

    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
      val s = (a.keySet ++ b.keySet).iterator
        .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
      if (s.size <= k) s
      else {
        val d = s.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
        s.flatMap { case (i, c) => if (c > d) Some(i -> (c - d)) else None }
      }
    }

    override def finish(r: Map[Long, Long]): Map[Long, Long] = r
    override def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  }

  /** Top heavy hitters of `keyCol` (long) in `df`, one sketch pass:
    * (key, est_count, max_underestimate) rows, largest estimates first,
    * ties on key. `est_count ∈ [f − N/(k+1), f]`; `max_underestimate` is
    * the N/(k+1) bound computed from the actual row count so a consumer
    * can read est+bound as the upper interval end.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, topN: Int): DataFrame = {
    val mg = udaf(new MisraGries(k))
    val sk = df.agg(
      mg(col(keyCol)).as("sketch"), count(lit(1)).as("n_total"))
    sk.select(explode(col("sketch")).as(Seq("key", "est_count")),
        (col("n_total") / (k + 1)).cast("long").as("max_underestimate"))
      .orderBy(col("est_count").desc, col("key"))
      .limit(topN)
  }

  /** ONLINE heavy hitters: the streaming form of [[heavyHitters]], built
    * on the property that makes MG production-viable at all —
    * mergeability. Each micro-batch is summarized DISTRIBUTEDLY by the
    * same `MisraGries` aggregator (map-side partials, one k-entry map per
    * partition on the shuffle), and `foreachBatch` folds the per-batch
    * summary into a running sketch via the identical merge the
    * aggregator's shuffle path uses — so the standing sketch after any
    * prefix of batches is itself an MG summary of the full prefix and
    * inherits the est ∈ [f − N/(k+1), f] guarantee (spec-pinned against
    * exact counts of the whole stream). Driver state: one k-entry map.
    */
  final class StreamingHeavyHitters(k: Int) extends Serializable {
    require(k >= 1)
    @volatile private var sketch: Map[Long, Long] = Map.empty
    @volatile private var nTotal: Long = 0L
    private val agg = new MisraGries(k)

    /** Summarize one micro-batch (distributed) and merge it in. */
    def absorb(batch: DataFrame, keyCol: String): Unit = {
      val mg = udaf(agg)
      val row = batch.agg(mg(col(keyCol)).as("sk"), count(lit(1)).as("n")).head()
      val bSketch = row.getMap[Long, Long](0).toMap
      synchronized {
        sketch = agg.merge(sketch, bSketch)
        nTotal += row.getLong(1)
      }
    }

    /** Current top estimates with the running guarantee bound. */
    def top(topN: Int): Seq[(Long, Long, Long)] = {
      val bound = nTotal / (k + 1)
      sketch.toSeq.map { case (key, est) => (key, est, bound) }
        .sortBy { case (key, est, _) => (-est, key) }.take(topN)
    }

    def total: Long = nTotal
  }

  /** Streaming twin of [[quantileSketch]], completing the pattern the MG
    * sketch set ([[StreamingHeavyHitters]]): each micro-batch is
    * summarized DISTRIBUTED — one compressed Greenwald–Khanna summary
    * per partition (Spark's own `QuantileSummaries`, the engine behind
    * `percentile_approx`) — and the partials fold into one standing
    * summary via GK's associative merge. The state after any prefix of
    * batches is therefore itself a GK summary of the full prefix and
    * carries the rank guarantee |true_rank(query(p)) − p·N| ≤ ε·N.
    * Driver state: one O((1/ε)·log(εN)) summary; the per-batch collect
    * is partition-count-bounded (one compressed summary each).
    */
  final class StreamingQuantiles(relativeError: Double) extends Serializable {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    require(relativeError > 0 && relativeError < 1)
    @volatile private var summary =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

    /** Summarize one micro-batch (one GK summary per partition) and
      * merge the compressed partials into the running summary. */
    def absorb(batch: DataFrame, valCol: String): Unit = {
      val err = relativeError
      val partials = batch.select(col(valCol).cast("double"))
        .na.drop()
        .mapPartitions { it =>
          var s = new QuantileSummaries(
            QuantileSummaries.defaultCompressThreshold, err)
          it.foreach(r => s = s.insert(r.getDouble(0)))
          Iterator.single(s.compress())
        }(org.apache.spark.sql.Encoders.kryo[QuantileSummaries])
        .collect()
      synchronized {
        summary = partials.foldLeft(summary) { (acc, p) =>
          if (p.count == 0) acc else acc.compress().merge(p)
        }
      }
    }

    /** Estimate for percentile p, with the running rank-error bound. */
    def query(p: Double): Option[(Double, Long)] = {
      val s = summary.compress()
      s.query(p).map(v => (v, math.ceil(relativeError * s.count).toLong))
    }

    def total: Long = summary.count
  }

  /** Bounded-error quantiles per group — the third leg of the mergeable
    * sketch family (HLL distinct, Misra–Gries frequency, GK quantiles).
    * Exact percentiles need a per-group sort; the Greenwald–Khanna
    * summary behind Spark's `approx_percentile` keeps O(accuracy·log N)
    * state per task and merges associatively, so at 100 TB the quantile
    * pass stays one map-side-combined aggregation. Guarantee: the
    * returned value's TRUE rank is within N/accuracy of p·N. Summary
    * contents depend on partition merge order (like HLL/MG) → the
    * registered query is rows-only; SketchesSpec verifies the rank bound
    * against exactly sorted data under adversarial partitionings, and
    * `max_rank_err` carries the guarantee next to each estimate.
    */
  def quantileSketch(df: DataFrame, keyCol: String, valCol: String,
                     ps: Seq[Double], accuracy: Int): DataFrame = {
    val pArr = array(ps.map(lit): _*)
    df.groupBy(col(keyCol))
      .agg(percentile_approx(col(valCol), pArr, lit(accuracy)).as("qs"),
        count(col(valCol)).as("n"))
      .select(col(keyCol), col("n"), posexplode(col("qs")))
      .withColumn("p", element_at(pArr, col("pos") + 1))
      .select(col(keyCol), col("p"), col("col").as("approx_value"),
        ceil(col("n") / accuracy).cast("long").as("max_rank_err"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
    * the point-frequency member of the mergeable family (HLL distinct,
    * Misra–Gries top-k, GK quantiles, CMS point lookups). The sketch is a
    * d×w counter matrix: row d counts collisions under hash h_d, and
    * est(x) = min_d M[d][h_d(x)] — an overestimate, never an
    * underestimate, with P(err > 2N/w) ≤ 2^−d under the universal family.
    *
    * Two properties distinguish CMS inside the family and shape the
    * implementation:
    *  - counters are pure SUMS, so merge is commutative matrix addition
    *    and the sketch state is PARTITION-ORDER-INVARIANT. This is the
    *    one sketch whose registered query can be fully oracle-checked:
    *    DuckDB replays the hash family and must reproduce the identical
    *    matrix, not just an estimate within a bound (MG/GK/HLL estimates
    *    are merge-order artifacts and get rows-only checks).
    *  - the matrix IS a groupBy((depth, bucket)).count() over the d row
    *    hashes — no custom Aggregator needed. Map-side combine caps the
    *    shuffle at d·w rows per task regardless of input cardinality,
    *    which is the whole point at 100 TB: frequency lookups over a key
    *    domain that outgrows any reducer hash table still cost one
    *    bounded-state pass.
    *
    * Hash family: h_d(x) = ((a_d·(x mod p) + b_d) mod p) mod w with the
    * Mersenne prime p = 2³¹−1 and a_d < 2³¹, so every intermediate fits a
    * BIGINT in both engines (max product < 2⁶². 2⁶³−1 is the overflow line).
    */
  object Cms {
    val P: Long = 2147483647L
    /** (a, b) per depth; classic LCG multipliers, all < 2³¹. */
    val seeds: Seq[(Long, Long)] = Seq(
      (1103515245L, 12345L), (69069L, 362437L),
      (134775813L, 1L), (214013L, 2531011L))

    private def bucket(key: Column, a: Long, b: Long, width: Int): Column =
      ((key % P) * a + b) % P % width

    /** The counter matrix as (d, bucket, c) rows — at most d·w of them. */
    def counters(df: DataFrame, keyCol: String, width: Int): DataFrame = {
      val hashes = seeds.zipWithIndex.map { case ((a, b), d) =>
        struct(lit(d).as("d"), bucket(col(keyCol), a, b, width).as("bucket"))
      }
      df.select(explode(array(hashes: _*)).as("h"))
        .groupBy(col("h.d").as("d"), col("h.bucket").as("bucket"))
        .agg(count(lit(1)).as("c"))
    }

    /** Point estimates for `probes` (carrying `keyCol` plus any payload
      * columns): min over the d probed cells. The matrix side is ≤ d·w
      * rows, so the join broadcasts; the probe side never shuffles.
      */
    def estimate(counters: DataFrame, probes: DataFrame, keyCol: String,
                 width: Int): DataFrame = {
      val hashes = seeds.zipWithIndex.map { case ((a, b), d) =>
        struct(lit(d).as("d"), bucket(col(keyCol), a, b, width).as("bucket"))
      }
      val carry = probes.columns.map(col)
      probes.select(carry :+ explode(array(hashes: _*)).as("h"): _*)
        .join(broadcast(counters),
          col("h.d") === counters("d") && col("h.bucket") === counters("bucket"))
        .groupBy(carry: _*)
        .agg(min(col("c")).as("cms_est"))
    }
  }

  /** Streaming twin of [[Cms]], completing the streaming sketch set
    * (MG [[StreamingHeavyHitters]], GK [[StreamingQuantiles]]): each
    * micro-batch is summarized DISTRIBUTEDLY by `Cms.counters` (map-side
    * combined, ≤ d·w rows collected) and added into the standing matrix.
    * Because CMS merge is commutative addition, the standing sketch after
    * any prefix of batches is BIT-IDENTICAL to the one-shot sketch of the
    * concatenated prefix — an exact invariant (spec-pinned), not just a
    * preserved error bound. Driver state: d·w longs.
    */
  final class StreamingCms(width: Int) extends Serializable {
    require(width >= 1)
    private val matrix = Array.fill(Cms.seeds.size, width)(0L)
    @volatile private var nTotal: Long = 0L

    def absorb(batch: DataFrame, keyCol: String): Unit = {
      val rows = Cms.counters(batch, keyCol, width).collect()
      val n = batch.count()
      synchronized {
        rows.foreach { r =>
          matrix(r.getInt(0))(r.getLong(1).toInt) += r.getLong(2)
        }
        nTotal += n
      }
    }

    /** Overestimate of key's frequency over everything absorbed. */
    def estimate(key: Long): Long =
      Cms.seeds.zipWithIndex.map { case ((a, b), d) =>
        matrix(d)((((key % Cms.P) * a + b) % Cms.P % width).toInt)
      }.min

    def total: Long = nTotal
  }

  /** Pairwise audience overlap between the groups of `typeCol` by HLL
    * inclusion-exclusion — `est(A∩B) = est(A) + est(B) − est(A∪B)` — with
    * the exact intersection beside it for error accounting.
    *
    * The union sketch per pair is built declaratively: each row joins the
    * OTHER group labels (broadcast; ≤ |T|−1 copies, |T| being the small
    * group domain), so the per-pair `approx_count_distinct` sees the
    * union's rows and no sketch objects ever cross the API — the whole
    * thing is one codegen'd plan with map-side partial HLL merges. The
    * intersection estimate inherits ~3 sketches' worth of rsd, so it is a
    * triage signal (which cohorts overlap heavily), not a count to bill
    * on — SketchesSpec bounds the error against planted overlaps.
    */
  def hllOverlap(df: DataFrame, typeCol: String, userCol: String,
      rsd: Double = 0.05): DataFrame = {
    val ev = df.select(col(typeCol).as("t"), col(userCol).as("u"))
    val types = ev.select(col("t").as("t2")).distinct()
    val unions = ev.join(broadcast(types), col("t2") =!= col("t"))
      .select(least(col("t"), col("t2")).as("a"),
        greatest(col("t"), col("t2")).as("b"), col("u"))
      .groupBy(col("a"), col("b"))
      .agg(approx_count_distinct(col("u"), rsd).as("est_union"))
    val perType = ev.groupBy(col("t"))
      .agg(approx_count_distinct(col("u"), rsd).as("est"))
    val tu = ev.distinct()
    val exact = tu.join(tu.select(col("t").as("tb"), col("u")), "u")
      .where(col("t") < col("tb"))
      .groupBy(col("t").as("a"), col("tb").as("b"))
      .agg(countDistinct(col("u")).as("exact_overlap"))
      .select(col("a"), col("b"), col("exact_overlap"))
    unions
      .join(perType.select(col("t").as("a"), col("est").as("est_a")), "a")
      .join(perType.select(col("t").as("b"), col("est").as("est_b")), "b")
      .join(exact, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
  }

  /** Materialized HLL sketch table — the warehouse pattern that makes
    * COUNT(DISTINCT) incremental at 100 TB. A distinct count cannot be
    * rolled up from per-partition counts (distincts don't add), so every
    * ad-hoc "distinct users over day range X" query re-scans the raw
    * fact table. Storing one SERIALIZED HLL sketch per (group) row
    * changes the algebra: sketches merge losslessly (the union of HLL
    * states IS the state of the union), so any rollup — week, month,
    * arbitrary day range, all-time — is a cheap aggregation over the
    * sketch table, and a new day appends one row without touching
    * history. Spark 4's native Datasketches functions (`hll_sketch_agg`
    * / `hll_union_agg` / `hll_sketch_estimate`) keep the whole pipeline
    * codegen'd with map-side partial merges; the sketch column is a
    * plain BINARY, so the table parquet-round-trips like any other.
    * SketchesSpec pins the algebra: merged-daily estimates equal the
    * direct whole-range sketch EXACTLY (same lgK, no downgrade), and
    * append-maintenance equals a full rebuild.
    */
  def sketchTable(df: DataFrame, groupCols: Seq[String], valCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Roll a sketch table up to `rollupCols`: lossless sketch union, then
    * one estimate per output row. `n_rows` adds exactly (plain sum).
    */
  def sketchRollup(sketches: DataFrame, rollupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    sketches.groupBy(rollupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("est_distinct"),
        sum(col("n_rows")).as("n_rows"))
}
