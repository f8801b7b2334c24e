#!/usr/bin/env python3
"""Generate larger-scale-factor fixture tables matching the driver's
sf0.001/0.01/0.1 parquet fixtures (TESTDATA.md / FIXTURES.md §B).

The driver ships read-only fixtures up to sf0.1; proving the SECOND decade
of scaling (sf0.1 → sf1) needs a 10× dataset with the SAME schemas,
logical types (events.ts is INT64 TIMESTAMP(NANOS)) and generative
distributions. Those distributions were measured off the driver fixtures:

  - lineitem: orderkey/partkey/suppkey uniform over their dimension
    domains (distinct-orderkey count matches the uniform-draw expectation
    n_orders·(1−e^−4)), linenumber ~ U{1..7}, quantity ~ U{1..50},
    extendedprice ~ U(900, 105000) (independent of quantity — ratio spans
    the full range), discount ∈ {0.00..0.10}, tax ∈ {0.00..0.08},
    shipdate ~ U[1995-01-02, 2001-11-04] at day granularity, independent
    of the order's orderdate (measured deltas span ±2400 days).
  - orders: status U{O,P,F}, totalprice U(1000, 500000), orderdate
    U[1995-01-01, 2001-08-01], priority U{5 TPC-H values}.
  - events: ts uniform ns over 2024-01-01..01-31 (30 days), user_id
    uniform over events/66.67 users (sf0.1: 1500), type U{click,view,
    purchase,signup,error}, value ~ Exp(mean 50) rounded to cents
    (measured quartiles 14.6/34.8/68.9 ≈ Exp(50)), props = {"k": U{0..99}}.
  - documents: tokens uniform from the fixture's 30-word vocabulary,
    length U{10..100}; lang ~ {en:.4, de/es/fr/zh:.15}; source = src(i%20)
    (exact equal counts in the originals); with p=.05 a doc instead copies
    a uniformly-chosen other doc's text with the marker token 'dup'
    appended (occasionally inserted one before the end) — reproducing the
    near-dup pair structure the dedup queries exercise.
  - embeddings: 64-dim unit-normalized float32 gaussians, label U{0..9}.

Row groups: ≤256k rows (the driver's single-row-group layout at sf0.1 is
an artifact of its size; multi-row-group files are the realistic layout
and give scan parallelism at sf1).

Usage: python3 tools/gen_sf_fixtures.py <sf> <outdir>
  e.g. python3 tools/gen_sf_fixtures.py 1 testdata/sf1
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast the row agg key query a scan batch").split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ROW_GROUP = 256_000


def day_range_ms(rng, n, lo, hi):
    """Uniform whole days in [lo, hi] as timestamp[ms] values."""
    lo_d = np.datetime64(lo, "D")
    hi_d = np.datetime64(hi, "D")
    days = rng.integers(0, (hi_d - lo_d).astype(int) + 1, n)
    return (lo_d + days.astype("timedelta64[D]")).astype("datetime64[ms]")


def write(path, table):
    pq.write_table(table, path, compression="snappy", row_group_size=ROW_GROUP)
    print(f"wrote {path}: {table.num_rows} rows")


def main(sf: float, out: str):
    rng = np.random.default_rng(42)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write(f"{out}/region.parquet", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    write(f"{out}/nation.parquet", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))
    write(f"{out}/customer.parquet", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]}))
    write(f"{out}/supplier.parquet", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))
    write(f"{out}/part.parquet", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
                   zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(P_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1)}))
    write(f"{out}/orders.parquet", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": day_range_ms(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]}))
    write(f"{out}/lineitem.parquet", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": day_range_ms(rng, n_li, "1995-01-02", "2001-11-04")}))

    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span = 30 * 86_400 * 1_000_000_000
    write(f"{out}/events.parquet", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(t0 + rng.integers(0, span, n_ev), pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, max(n_ev // 67, 1), n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    texts = []
    for i in range(n_doc):
        n = rng.integers(10, 101)
        texts.append(" ".join(np.array(VOCAB)[rng.integers(0, 30, n)]))
    dup_mask = rng.random(n_doc) < 0.05
    for i in np.flatnonzero(dup_mask):
        src = int(rng.integers(0, n_doc))
        toks = texts[src].split()
        pos = len(toks) if rng.random() < 0.9 else max(len(toks) - 1, 0)
        texts[i] = " ".join(toks[:pos] + ["dup"] + toks[pos:])
    write(f"{out}/documents.parquet", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(f"{out}/embeddings.parquet", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))

    with open(f"{out}/MANIFEST.json", "w") as f:
        json.dump({"sf": sf, "seed": 42, "rows": {
            "customer": n_cust, "supplier": n_supp, "part": n_part,
            "orders": n_ord, "lineitem": n_li, "events": n_ev,
            "documents": n_doc, "embeddings": n_emb}}, f, indent=2)


def main_zipf_docs(n_doc: int, out: str):
    """A documents table with a REALISTIC vocabulary: Zipf(1.0) draws over
    a 2000-token vocabulary (same distribution as DedupSpec's candidate-
    volume evidence, at fixture scale). The stock fixture's 30-word
    vocabulary makes every document pair near-identical in token-set
    space, so pair-query output grows quadratically there by semantics,
    not by engine defect; this corpus shows the same plans at the same
    row count with natural-language-like token sharing."""
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(2000)])
    ranks = np.arange(1, 2001, dtype=np.float64)
    p = (1.0 / ranks); p /= p.sum()
    texts = []
    for _ in range(n_doc):
        n = rng.integers(10, 101)
        texts.append(" ".join(vocab[rng.choice(2000, n, p=p)]))
    dup_mask = rng.random(n_doc) < 0.05
    for i in np.flatnonzero(dup_mask):
        src = int(rng.integers(0, n_doc))
        toks = texts[src].split()
        pos = len(toks) if rng.random() < 0.9 else max(len(toks) - 1, 0)
        texts[i] = " ".join(toks[:pos] + ["dup"] + toks[pos:])
    langs = ["en", "de", "es", "fr", "zh"]
    write(f"{out}/documents.parquet", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(langs)[rng.choice(5, n_doc, p=[0.4, .15, .15, .15, .15])],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))


if __name__ == "__main__":
    import os
    if sys.argv[1] == "--zipf-docs":
        n_doc, out = int(sys.argv[2]), sys.argv[3]
        os.makedirs(out, exist_ok=True)
        main_zipf_docs(n_doc, out)
    else:
        sf = float(sys.argv[1])
        out = sys.argv[2]
        os.makedirs(out, exist_ok=True)
        main(sf, out)
