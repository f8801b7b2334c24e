#!/usr/bin/env python3
"""Driver-equivalent DuckDB comparator (local iteration aid).

Usage: python3 tools/compare_duckdb.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle statement in DuckDB against the parquet tables in <sfDir>, and
compares rows/schema/value-hash against the engine's dumped parquet in
<verifyOutDir>/<name>/. Mirrors the driver's compare: columns sorted by
name, rows sorted by all columns, md5 over the csv-ish rendering.

TYPE-AWARE since round 10: the oracle side is fetched via Arrow (not
fetchall), and cell rendering distinguishes Decimal from int from float.
DuckDB types COALESCE(SUM(bigint),0) as HUGEINT, which exports over
Arrow as decimal128(38,0); cursor.fetchall() collapses that to Python
int, which let three rounds of local "green" mask a driver hash-red on
ev_ingest_quarantine (VERDICT r9 "What's wrong" #1-2). Rendering
Decimal('42') differently from 42 makes any engine-int64 vs
oracle-decimal divergence fail HERE first. tools/oracle_type_lint.py is
the companion registry-wide guard.
"""
import os, re, sys, json, glob, hashlib
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        # Deliberately distinct from the int rendering: a decimal128
        # oracle column vs an int64 engine column must hash-diverge even
        # when the values are numerically identical (the driver's hash
        # is type-sensitive; ours must be at least as strict).
        return f"decimal:{v}"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # Parallel sweeps (several comparator processes at once) overcommit:
    # each DuckDB defaults to 80% of RAM. Cap per-process resources via
    # env when fanning out (e.g. DUCKDB_MEMORY_LIMIT=16GB DUCKDB_THREADS=6).
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        # validate before interpolating into the SET statement: a quote or
        # junk value would break the SQL with a confusing parse error
        # (threads at least goes through int()) — ADVICE r13
        mem = os.environ["DUCKDB_MEMORY_LIMIT"].strip()
        if not re.fullmatch(r"\d+(\.\d+)?\s*[KMGT]i?B", mem, re.IGNORECASE):
            sys.exit(f"DUCKDB_MEMORY_LIMIT must be a size literal like "
                     f"14GB/512MiB, got: {mem!r}")
        con.execute(f"SET memory_limit='{mem}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    results, fails = {}, []
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            results[name] = {"err": "engine output missing"}
            fails.append(name)
            continue
        spark_tbl = pq.read_table(files[0])
        s_cols = list(spark_tbl.column_names)
        s_rows = [tuple(spark_tbl.column(c)[i].as_py() for c in s_cols)
                  for i in range(spark_tbl.num_rows)]
        try:
            oracle_tbl = con.execute(sql).arrow()
            o_cols = list(oracle_tbl.column_names)
            o_rows = [tuple(oracle_tbl.column(c)[i].as_py() for c in o_cols)
                      for i in range(oracle_tbl.num_rows)]
            o_types = {f.name: str(f.type) for f in oracle_tbl.schema}
        except Exception as e:
            results[name] = {"err": f"oracle error: {e}"}
            fails.append(name)
            continue
        r = {
            "rows_match": len(s_rows) == len(o_rows),
            "schema_match": sorted(s_cols) == sorted(o_cols),
            "hash_match": table_hash(s_cols, s_rows) == table_hash(o_cols, o_rows),
            "spark_rows": len(s_rows), "oracle_rows": len(o_rows),
        }
        decimal_cols = [c for c, t in o_types.items() if t.startswith("decimal")]
        if decimal_cols:
            r["oracle_decimal_cols"] = decimal_cols
        results[name] = r
        if not (r["rows_match"] and r["schema_match"] and r["hash_match"]):
            fails.append(name)
    for name, r in results.items():
        status = "FAIL" if name in fails else "ok"
        print(f"{status:4s} {name:32s} {json.dumps(r)}")
    n_ok = len(results) - len(fails)
    print(f"\n{n_ok}/{len(results)} green; fails: {fails or 'none'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
