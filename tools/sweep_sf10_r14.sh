#!/bin/bash
# Round-14 sf10 correctness sweep (scoped): the 7 new md5-rank subset
# twins (this round's evidence ask — every heavy pair family now has a
# third-decade oracle row) plus a cross-family spot-check of rows from
# the r13 138-green set whose engine code this round did NOT touch
# (regression canaries). The full 138-row replay lives in
# SF10_SWEEP_r13.json; this round's code changes (Ivf census/grid,
# broadcast pricing, triangle grid state) affect only rows that were
# EXCLUDED from that sweep — exactly the rows the twins now cover.
set -u
SF=testdata/sf10
OUT=/tmp/verify_sf10_r14
TWINS="doc_jaccard_pairs_sub doc_containment_pairs_sub doc_dup_groups_sub \
cust_fuzzy_pairs_sub emb_semdedup_sub emb_dup_pairs_sub emb_contamination_sub"
CANARIES="q1_pricing_summary ev_hourly_revenue ev_sessionized doc_bpe_encoded \
doc_minhash_pairs_md5 doc_simhash_pairs_md5 ann_ivf_topk ann_cell_split \
ev_cdc_apply doc_span_dedup mm_media_stats ev_pagerank ev_lpa_communities \
doc_exact_dedup emb_norms"
# doc_leakproof_split rides the Verify dump (spark side only — its
# recursive-closure oracle is quadratic at sf10): the round's broadcast
# re-pricing touches dupGroups, so re-prove the 500k-row dump stays OOM-free
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 \
  sbt "runMain graft.Verify $SF $OUT $TWINS $CANARIES doc_leakproof_split" \
  > /tmp/sweep_sf10_r14_verify.log 2>&1
echo "verify rc=$?"
DUCKDB_MEMORY_LIMIT=40GB DUCKDB_THREADS=16 \
  python3 /tmp/compare.py $SF $OUT $TWINS $CANARIES \
  > /tmp/sweep_sf10_r14_compare.log 2>&1
echo "compare rc=$?"
tail -4 /tmp/sweep_sf10_r14_compare.log
