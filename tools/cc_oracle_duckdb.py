#!/usr/bin/env python3
"""Scalable DuckDB oracle for `doc_dup_groups` (builder/driver-side tool;
NOT a library dependency — runs with the driver's python deps).

The registered single-statement oracle verifies the query at sf<=0.1, but
its recursive-CTE transitive closure is quadratic per connected component
— at sf1 the fixture's dense near-dup clusters push it past any sane
timeout while the engine answers in under a minute. This tool reaches the
SAME fixed point with an iterative temp-table label-propagation loop
(labels only decrease, one edge-join + group-by per round, O(diameter)
rounds — the exact algorithm class the engine's `Dedup.dupGroups` uses,
but recomputed INDEPENDENTLY in DuckDB, including the pair set itself),
then compares the engine's parquet output exactly.

Usage: cc_oracle_duckdb.py <sfDir> <engineOutDir>/doc_dup_groups
"""
import sys, time
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
engine_out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1_r5/doc_dup_groups"

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")

t0 = time.time()
# Same pair semantics as the registered oracle's `d`/`p` CTEs: distinct-word
# Jaccard >= 0.8 within (lang, source) blocks.
con.execute("""CREATE TEMP TABLE d AS
  SELECT doc_id, lang, source,
         list_distinct(regexp_split_to_array(text, '\\s+')) AS w
  FROM documents""")
con.execute("""CREATE TEMP TABLE edges AS
  WITH p AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
      AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.w, b.w)) /
        (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8)
  SELECT a_id AS s, b_id AS t FROM p UNION SELECT b_id, a_id FROM p""")
n_edges = con.execute("SELECT count(*) FROM edges").fetchone()[0]
t_pairs = time.time() - t0
print(f"pairs: {n_edges} directed edges in {t_pairs:.0f}s", flush=True)

# Label propagation to the min-label fixed point.
con.execute("CREATE TEMP TABLE lab AS SELECT doc_id AS id, doc_id AS lbl FROM documents")
rounds = 0
t1 = time.time()
while True:
    rounds += 1
    con.execute("""CREATE TEMP TABLE nxt AS
      SELECT l.id, LEAST(l.lbl, coalesce(m.mn, l.lbl)) AS lbl
      FROM lab l LEFT JOIN (
        SELECT e.t AS id, min(l2.lbl) AS mn
        FROM edges e JOIN lab l2 ON l2.id = e.s GROUP BY e.t) m
      ON m.id = l.id""")
    changed = con.execute(
        "SELECT count(*) FROM nxt JOIN lab USING (id) WHERE nxt.lbl <> lab.lbl"
    ).fetchone()[0]
    con.execute("DROP TABLE lab")
    con.execute("ALTER TABLE nxt RENAME TO lab")
    if changed == 0:
        break
print(f"label propagation: fixed point after {rounds} rounds "
      f"in {time.time()-t1:.0f}s", flush=True)

got = con.execute(
    f"SELECT * FROM '{engine_out}/*.parquet' ORDER BY doc_id").df()
exp = con.execute(
    "SELECT id AS doc_id, CAST(lbl AS BIGINT) AS group_id FROM lab ORDER BY doc_id").df()
if len(got) != len(exp):
    print(f"✗ doc_dup_groups: rows engine={len(got)} oracle={len(exp)}")
    sys.exit(1)
for c in ("doc_id", "group_id"):
    if not (got[c].values == exp[c].values).all():
        bad = (got[c].values != exp[c].values).argmax()
        print(f"✗ doc_dup_groups: col {c} row {bad}: "
              f"{got[c].values[bad]} vs {exp[c].values[bad]}")
        sys.exit(1)
n_groups = con.execute(
    "SELECT count(DISTINCT lbl), count(*) FILTER (WHERE id <> lbl) FROM lab"
).fetchone()
print(f"✓ doc_dup_groups: {len(got)} rows exact-match; "
      f"{n_groups[0]} components, {n_groups[1]} non-singleton members; "
      f"total {time.time()-t0:.0f}s", flush=True)
