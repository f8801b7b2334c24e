#!/usr/bin/env python3
"""Driver-equivalent DuckDB comparator (local iteration aid).

Usage: python3 tools/compare_duckdb.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle statement in DuckDB against the parquet tables in <sfDir>, and
compares rows/schema/value-hash against the engine's dumped parquet in
<verifyOutDir>/<name>/. Mirrors the driver's compare: columns sorted by
name, rows sorted by all columns, md5 over the csv-ish rendering.
"""
import sys, json, glob, hashlib

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
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
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
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
