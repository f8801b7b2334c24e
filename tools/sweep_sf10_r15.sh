#!/bin/bash
# Round-15 CONSOLIDATED sf10 correctness sweep (VERDICT r14 ask #2): one
# artifact replacing the r13 (138-row full replay) + r14 (22-row scoped)
# two-artifact record. Scope: every oracle row whose DuckDB replay is not
# quadratic at sf10 — the r13 exclusion rule (containment/jaccard/fuzzy/
# dup-graph/emb-pair/semdedup pair families, emb_knn_join,
# emb_test_contamination) — PLUS every capped/subset family twin, PLUS
# the round's addition: the dup-closed MinHash twin (the r14 md5 row
# swept 0-vs-0 at sf10; the new slice provably carries planted pairs).
# doc_leakproof_split rides the Verify dump spark-side only (its
# recursive-closure oracle is quadratic at sf10).
set -u
cd "$(dirname "$0")/.."
SF=testdata/sf10
OUT=/tmp/verify_sf10_r15

# Include list = (r13 sweep ∪ r14 sweep) + round-15 additions; the union
# IS "all oracle rows minus the quadratic-excluded 28" (checked against
# CORRECTNESS_r14.json).
QUERIES=$(python3 - <<'EOF'
import json
r13 = set(json.load(open('SF10_SWEEP_r13.json'))['queries'])
r14 = set(json.load(open('SF10_SWEEP_r14.json'))['queries'])
new = {'doc_minhash_pairs_md5_sub'}
print(' '.join(sorted(r13 | r14 | new)))
EOF
)
echo "sweeping $(echo $QUERIES | wc -w) queries"

SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 \
  sbt "runMain graft.Verify $SF $OUT $QUERIES doc_leakproof_split" \
  > /tmp/sweep_sf10_r15_verify.log 2>&1
echo "verify rc=$?"

# 6-way parallel comparator, resource-capped per process; rows that fail
# on resources get rerun solo at 100GB (r13 protocol).
python3 - <<EOF
import os, subprocess, sys
qs = """$QUERIES""".split()
chunks = [qs[i::6] for i in range(6)]
env = dict(os.environ, DUCKDB_MEMORY_LIMIT='14GB', DUCKDB_THREADS='6')
procs = [subprocess.Popen(
    ['python3', 'tools/compare_duckdb.py', '$SF', '$OUT'] + c,
    stdout=open(f'/tmp/sweep_r15_cmp_{i}.log', 'w'),
    stderr=subprocess.STDOUT, env=env)
    for i, c in enumerate(chunks)]
for p in procs:
    p.wait()
print('comparator shards done')
EOF
grep -h "^FAIL\|green; fails" /tmp/sweep_r15_cmp_*.log
