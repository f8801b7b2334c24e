package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Queries without an oracle get the driver's weaker
  * rows-only check and are instead verified by ScalaTest specs.
  *
  * The remaining oracle-less queries are engine-side BY DESIGN, each with a
  * spec that verifies the property the oracle can't:
  *  - `ann_lsh_topk` / `ann_lsh_multiprobe` — recall < 1 by construction
  *    (chunked sign-bit LSH over seeded Gaussian planes); SimilaritySpec
  *    measures recall against the exact result. The SAME pipelines in
  *    their oracle-replayable configs (`ann_lsh_topk_md5` /
  *    `ann_lsh_multiprobe_md5`: md5-derived integer planes through the
  *    same fused kernel, chunk index, Hamming-1 probe expansion and
  *    rerank) ARE hash-checked end-to-end, as are the exact ANN surfaces
  *    (`ann_brute_topk`, full-probe `ann_ivf_topk`).
  *  - `doc_minhash_pairs` — MinHash permutations are engine-side constants
  *    (seeded RNG + xxhash64 band folding); DedupSpec checks candidates
  *    against exact shingle Jaccard. The SAME pipeline in its
  *    oracle-replayable config (`doc_minhash_pairs_md5`: md5 shingle
  *    hashes, formula permutations, literal band keys) IS hash-checked
  *    end-to-end — as is its INCREMENTAL day-over-day shape
  *    (`doc_minhash_incremental_md5`: batch probes the standing band
  *    index + intra-batch self-join, old×old never regenerated) — and
  *    so are the exact pair surfaces (`doc_jaccard_pairs`,
  *    `emb_dup_pairs`).
  *  - `doc_simhash_pairs` — weighted-token SimHash is engine-side
  *    (xxhash64 token hashes); DedupSpec pins signatures and verifies
  *    the Hamming pigeonhole. The SAME chunk-bucketed pipeline in its
  *    oracle-replayable config (`doc_simhash_pairs_md5`: 60-bit md5
  *    token hashes, shared pigeonhole join) IS hash-checked
  *    end-to-end — as is its INCREMENTAL day-over-day shape
  *    (`doc_simhash_incremental_md5`: batch probes the standing chunk
  *    index + intra-batch self-join, old×old never regenerated).
  *  - `ev_hll_users` — HLL++ estimates are engine-specific; the spec
  *    bounds them against exact counts within the configured rsd.
  *  - `ev_hll_overlap` — HLL inclusion-exclusion intersection estimates
  *    are engine-specific (like `ev_hll_users`, whose sketches they
  *    reuse); the exact intersection rides in the same output row, and
  *    SketchesSpec bounds the estimate error against planted overlaps.
  *  - `ev_sketch_rollup` — Datasketches HLL estimates are engine-side
  *    (like `ev_hll_users`); the exact weekly count rides in-row AND is
  *    oracle-checked as its own row (`ev_sketch_rollup_exact`: the
  *    daily→weekly n_rows rollup plus the exact weekly distinct under
  *    the DuckDB oracle), and
  *    SketchesSpec pins the sketch-table algebra itself: merged daily
  *    sketches estimate EXACTLY like a direct whole-range sketch when
  *    each group's rows land in one sketch (the partitioned-table
  *    case), and per-batch streaming appends track a full rebuild
  *    within the sketch's own resolution after every prefix (partial
  *    sketches of one group promote out of sparse mode along different
  *    paths than a one-pass sketch).
  *  - `ev_heavy_hitters` — Misra–Gries estimates depend on merge order
  *    (like HLL); SketchesSpec proves the est ∈ [f − N/(k+1), f]
  *    guarantee against exact counts under multiple partitionings. The
  *    SAME aggregator in its provably-exact regime (domain ≤ k,
  *    `ev_heavy_hitters_exact`) IS oracle-checked to equality.
  *  - `ev_value_quantile_sketch` — Greenwald–Khanna summaries likewise
  *    depend on partition merge order; SketchesSpec proves the rank
  *    bound |true_rank − p·N| ≤ N/accuracy against exactly sorted data.
  *    The SAME path in its provably-exact regime (accuracy ≥ N ⇒ rank
  *    error < 1 ⇒ the element at rank ⌈p·n⌉, `ev_quantile_sketch_
  *    exactmode`) IS oracle-checked to equality, as is the
  *    exact-percentile surface (quantity_quantiles).
  *  - `ann_ivf_recall` — a META query (recall@10 of partial-probe IVF vs
  *    the oracle-green exact result, per nProbe); the exact surfaces it
  *    measures against ARE oracle-checked, IvfSpec gates the curve, and
  *    the index-MAINTENANCE half (cell assignment of a new batch to
  *    standing centroids) is itself hash-checked under seed-vector
  *    centroids (`ann_ivf_incremental_assign` — the kernel's exact
  *    ||c||²−2v·c arithmetic replayed in index order).
  *  - `emb_pca_explained` — float covariance sums are partition-order
  *    dependent, so eigenvalues differ in the last ulps across
  *    partitionings; PcaSpec pins the covariance against an exact
  *    driver-side reference, eigenpair residuals, and projection
  *    decorrelation, and the query itself re-measures each eigenvalue as
  *    the distributed variance of the projected coordinate.
  *  - `emb_knn_graph` — same META shape for the bucketed kNN graph:
  *    recall@5 of `Ivf.knnGraph` per probe depth against the
  *    oracle-green exact join (`emb_knn_join`); IvfSpec additionally
  *    pins knnGraph row-identical to `Ivf.search(corpus, corpus)`, and
  *    the FULL-PROBE graph (exhaustive IVF = exact) is itself
  *    hash-checked under the brute-force oracle (`emb_knn_graph_exact`),
  *    so the graph machinery — assignment kernel, grid-salted cluster
  *    join, bounded top-k — sits under the driver gate.
  *  - `ann_pq_recall` — same META shape for the IVF-PQ compressed path:
  *    ADC scores are approximate by construction (quantization error), so
  *    the query measures recall against the oracle-exact brute-force
  *    result; PqSpec pins the ADC arithmetic itself against an
  *    independent driver-side reference, and the ENCODE stage (per
  *    sub-space nearest codeword through the same fused kernel) is
  *    hash-checked under seed-vector codebooks (`ann_pq_encode_seeded`).
  *    Only the ADC Σⱼ-pdot group sum stays spec-land: float SUM
  *    accumulation order is contracted by no SQL engine.
  *
  * Determinism contract (so the DuckDB hash-compare is meaningful):
  *  - every result is fully ordered by its key columns, in both engines;
  *  - double outputs are produced by exact DECIMAL(18,2) aggregation (or a
  *    single IEEE division of exact inputs) so both engines emit identical
  *    bit patterns regardless of row/partition order;
  *  - timestamps are truncated to whole seconds (the events table is
  *    nanosecond-precision, which the two engines read differently).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def unchecked(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
