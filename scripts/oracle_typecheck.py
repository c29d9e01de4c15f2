#!/usr/bin/env python3
"""Oracle result-TYPE lint — catches the round-7 HUGEINT bug class.

The driver's hash compare is TYPE-sensitive: DuckDB renders sum(<integer>)
as HUGEINT (INT128), which hashes differently from Spark's BIGINT even when
every cell value matches (23 round-6/7 queries shipped red this way; see
VERDICT.md round 7). This lint types every oracle query's result relation
via `LIMIT 0` and fails on any column whose DuckDB type can never appear in
a Spark parquet dump: HUGEINT, UHUGEINT, or DECIMAL(38,0) (DuckDB's other
128-bit spelling).

Usage: python3 scripts/oracle_typecheck.py <sfDir> <oracle_sql.json>
"""
import sys, json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_TYPES = {"HUGEINT", "UHUGEINT", "DECIMAL(38,0)"}


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracle = json.load(f)
    n_bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 0")
            bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                   if str(t) in BAD_TYPES]
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
            continue
        if bad:
            print(f"BAD  {name}: {bad}")
            n_bad += 1
    print(f"== {len(oracle) - n_bad} clean, {n_bad} bad of {len(oracle)} oracle queries ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
