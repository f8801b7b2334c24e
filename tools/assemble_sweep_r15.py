#!/usr/bin/env python3
"""Assemble SF10_SWEEP_r15.json from the 6 comparator shard logs.

The consolidated round-15 artifact (VERDICT r14 ask #2): one standing
third-decade record covering every non-quadratic oracle row plus every
family subset twin, replacing the r13+r14 two-artifact pair.
"""
import json, re, sys

queries = {}
# shards 2-5 of the original 6-way run, plus the solo per-query rerun of
# shards 0-1 (those two crashed on host malloc under the parallel fan-out
# and were replayed one DuckDB process per query at 40GB — the r13
# resource-red rerun branch)
logs = [f"/tmp/sweep_r15_cmp_{i}.log" for i in range(2, 6)]
logs.append("/tmp/sweep_r15_cmp_solo.log")
for path in logs:
    for line in open(path):
        m = re.match(r"(ok|FAIL)\s+(\S+)\s+(\{.*\})$", line.strip())
        if m:
            queries[m.group(2)] = json.loads(m.group(3))

green = sum(1 for r in queries.values()
            if r.get("rows_match") and r.get("schema_match")
            and r.get("hash_match"))
out = {
    "sf": "testdata/sf10",
    "round": 15,
    "swept": len(queries),
    "green": green,
    "protocol": ("graft.Verify dumps at sf10 (24g driver, local[32]) -> "
                 "tools/compare_duckdb.py per query; 6-way parallel with "
                 "DUCKDB_MEMORY_LIMIT=14GB DUCKDB_THREADS=6"),
    "scope": ("CONSOLIDATED standing gate: union of the r13 138-row full "
              "replay and the r14 22-row scoped sweep, plus the round-15 "
              "dup-closed MinHash subset twin — every oracle row whose "
              "DuckDB replay is not quadratic at sf10 AND a direct subset "
              "twin for every family that is; doc_leakproof_split rides "
              "the Verify dump spark-side (quadratic oracle)"),
    "exclusion_rule": ("production-scale pair-family rows whose DuckDB "
                       "oracle is quadratic at sf10 (containment/jaccard/"
                       "fuzzy/dup-graph/emb-pair/semdedup families, "
                       "emb_knn_join, emb_test_contamination) — each "
                       "covered here by its family's subset twin"),
    "queries": dict(sorted(queries.items())),
}
fails = [q for q, r in queries.items()
         if not (r.get("rows_match") and r.get("schema_match")
                 and r.get("hash_match"))]
with open("SF10_SWEEP_r15.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"{green}/{len(queries)} green; fails: {fails or 'none'}")
