package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomExpressions

/** Exact left-semi join accelerated by a broadcast Bloom prefilter.
  *
  * The 100 TB pattern this serves: `fact SEMI JOIN dim ON fact.k = dim.k`
  * where `dim`'s key set is far smaller than the fact table but too large
  * (or too contended) to rely on a broadcast-hash plan, so Catalyst picks a
  * shuffle join — and the shuffle then carries EVERY fact row, matched or
  * not. Building a Bloom filter over the dim keys (distributed build via
  * `DataFrameStatFunctions.bloomFilter`, ~1.2 MB per million keys at 1%
  * fpp) and probing it on the fact scan cuts the fact-side shuffle volume
  * to (true match rate + fpp) before the exact join runs.
  *
  * Exactness is preserved by construction: a Bloom filter has no false
  * negatives, so every matching row survives the prefilter, and the exact
  * semi join afterwards removes the fpp-fraction of false positives. The
  * result is bit-identical to the plain semi join (BloomJoinSpec proves
  * equality; the oracle for `bloom_semi_revenue` is the plain `IN`
  * subquery).
  *
  * Spark's `InjectRuntimeFilter` plants this shape automatically when its
  * heuristics fire (creation-side size/selectivity thresholds); this
  * operator is the explicit form for pipeline authors who KNOW the
  * selectivity — e.g. "keep only documents whose fingerprint appears in
  * yesterday's index" — and for plans (aggregated/exchanged creation side)
  * the heuristics skip.
  */
object BloomJoin {

  /** `fact` rows whose `factKey` appears in `dim`'s `dimKey` column.
    *
    * @param expectedItems sizing for the filter; pass the (approximate)
    *   distinct key count if known, or leave negative to spend one
    *   dim-side count job (dim-sized — cheap relative to the fact scan
    *   this prefilter protects).
    */
  def semiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    require(factKey != dimKey || fact.columns.sameElements(dim.columns) == false,
      "factKey and dimKey resolve against their own sides")
    val keys = dim.select(col(dimKey)).where(col(dimKey).isNotNull).distinct()
    val n = if (expectedItems > 0) expectedItems else math.max(64L, keys.count())
    val bytes = BloomExpressions.serialize(keys.stat.bloomFilter(dimKey, n, fpp))
    val pre = fact.where(BloomExpressions.mightContainLong(col(factKey), bytes))
    pre.join(keys, col(factKey) === col(dimKey), "left_semi")
  }

  /** The prefilter alone (no verify join) — the building block for
    * fpp-tolerant consumers (e.g. candidate generation that verifies
    * later anyway). Returned rows are a superset of the exact semi join
    * by at most the fpp fraction of non-matching rows.
    */
  def prefilter(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey)).where(col(dimKey).isNotNull).distinct()
    val n = if (expectedItems > 0) expectedItems else math.max(64L, keys.count())
    val bytes = BloomExpressions.serialize(keys.stat.bloomFilter(dimKey, n, fpp))
    fact.where(BloomExpressions.mightContainLong(col(factKey), bytes))
  }
}
