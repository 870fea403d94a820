#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet that graft.Verify wrote, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = <sfDir>/<name>.parquet
registered as views named by file stem), then compares: column names
(sorted), row counts, and row multisets (sorted, with tolerant float
compare). Exits nonzero if any query mismatches.
"""
import json
import math
import os
import sys
from decimal import Decimal

import duckdb


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    return v


def key(row):
    return tuple((x is None, str(type(x)), x) for x in row)


def compare(name, spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    s = sorted([tuple(norm(v) for v in r) for r in spark_rows], key=key)
    d = sorted([tuple(norm(v) for v in r) for r in duck_rows], key=key)
    for i, (a, b) in enumerate(zip(s, d)):
        for j, (x, y) in enumerate(zip(a, b)):
            ok = (x == y)
            if not ok and isinstance(x, float) and isinstance(y, float):
                ok = math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
            if not ok:
                return (f"value mismatch at sorted row {i} col {cols[j]}: "
                        f"spark={x!r} duck={y!r}")
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            name = f[:-8]
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{f}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)
    failures, passed, rows_only = [], [], []
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        cols_spark = sorted(spark.columns)
        spark_sorted = con.sql(
            f"SELECT {', '.join(cols_spark)} FROM spark").fetchall()
        if name not in oracles:
            n = len(spark_sorted)
            rows_only.append(f"{name} (rows={n})")
            if n == 0 and name not in ("dedup_minhash", "dedup_simhash",
                                       "dedup_jaccard"):
                failures.append(f"{name}: rows-only query returned 0 rows")
            continue
        try:
            duck = con.sql(oracles[name])
            cols_duck = sorted(duck.columns)
            if cols_spark != cols_duck:
                failures.append(
                    f"{name}: column mismatch spark={cols_spark} "
                    f"duck={cols_duck}")
                continue
            duck_sorted = con.sql(
                f"SELECT {', '.join(cols_duck)} FROM duck").fetchall()
            err = compare(name, spark_sorted, duck_sorted, cols_spark)
            if err:
                failures.append(f"{name}: {err}")
            else:
                passed.append(name)
        except Exception as e:
            failures.append(f"{name}: oracle error: {str(e)[:300]}")
    print(f"PASS ({len(passed)}): {' '.join(passed)}")
    print(f"ROWS-ONLY ({len(rows_only)}): {' '.join(rows_only)}")
    if failures:
        print(f"FAIL ({len(failures)}):")
        for f in failures:
            print("  " + f)
        sys.exit(1)
    missing = set(oracles) - set(passed)
    if missing:
        print(f"ORACLE WITHOUT RESULT DIR: {missing}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
