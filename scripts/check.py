#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each <outDir>/<name> parquet dump, runs the matching oracle SQL from
<outDir>/oracle_sql.json in DuckDB over the same sfDir tables, then
compares row counts, column names (sorted), and cell values (rows sorted,
columns sorted by name) — mirroring the driver's hash compare.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rel = con.sql(f"SELECT {', '.join(exp_cols)} FROM ({sql})")
            exp_types = [str(t) for t in exp_rel.types]
            exp_rows = sorted(
                tuple(norm(v) for v in row) for row in exp_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rel = con.sql(
                f"SELECT {', '.join(got_cols)} FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_types = [str(t) for t in got_rel.types]
            got_rows = sorted(
                tuple(norm(v) for v in row) for row in got_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark dump error: {str(e)[:300]}")
            failures += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns exp={exp_cols} got={got_cols}")
            failures += 1
        elif exp_types != got_types:
            # The driver's hash is type-sensitive: a DuckDB HUGEINT sum vs a
            # Spark BIGINT hashes differently even when values match.
            diffs = [
                f"{c}: oracle={e} spark={g}"
                for c, e, g in zip(exp_cols, exp_types, got_types) if e != g]
            print(f"FAIL {name}: column types differ: {diffs}")
            failures += 1
        elif len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: rows exp={len(exp_rows)} got={len(got_rows)}")
            failures += 1
        elif exp_rows != got_rows:
            bad = [(e, g) for e, g in zip(exp_rows, got_rows) if e != g][:3]
            print(f"FAIL {name}: value mismatch ({len(bad)}+ diffs), first: {bad}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
