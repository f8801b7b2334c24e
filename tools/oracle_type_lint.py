#!/usr/bin/env python3
"""Registry-wide oracle output-type lint.

Usage: python3 tools/oracle_type_lint.py <sfDir> <verifyOutDir>

Runs every oracle statement in <verifyOutDir>/oracle_sql.json through
DuckDB with LIMIT 0 and inspects the Arrow schema of the final
projection. Fails if any column is decimal128/decimal256 — the
HUGEINT-by-accident class: DuckDB types SUM(BIGINT) (and
COALESCE(SUM(...),0)) as HUGEINT, which exports over Arrow as
decimal128(38,0) while the engine emits int64, so a type-sensitive
driver hash diverges on value-identical output (ev_ingest_quarantine
was driver-red three rounds running on exactly this; VERDICT r9
"What's wrong" #1). Every oracle's aggregate/computed final projection
must CAST to a concrete Arrow-stable type (BIGINT, DOUBLE, VARCHAR...).

Run after graft.Verify as part of the round-close protocol, alongside
tools/compare_duckdb.py (whose cell rendering is now type-aware too).
"""
import sys, json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED_PREFIXES = ("decimal128", "decimal256")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    offenders, errors = [], []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            schema = con.execute(
                f"SELECT * FROM ({sql}) __lint LIMIT 0").arrow().schema
        except Exception as e:
            errors.append((name, str(e).splitlines()[0]))
            continue
        bad = [(f.name, str(f.type)) for f in schema
               if str(f.type).startswith(BANNED_PREFIXES)]
        if bad:
            offenders.append((name, bad))
    for name, bad in offenders:
        print(f"DECIMAL {name}: {bad}")
    for name, err in errors:
        print(f"ERROR   {name}: {err}")
    n = len(oracles)
    print(f"\n{n - len(offenders) - len(errors)}/{n} oracles type-clean; "
          f"{len(offenders)} decimal offenders, {len(errors)} errors")
    sys.exit(1 if (offenders or errors) else 0)


if __name__ == "__main__":
    main()
