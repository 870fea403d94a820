#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate — STRICT mode.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet that graft.Verify wrote, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = <sfDir>/<name>.parquet
registered as views named by file stem), then compares:

  - column names (sorted)
  - DECLARED DuckDB column types — a BIGINT result vs a HUGEINT oracle is
    a failure even though Python fetches both as int (round-1 lesson:
    offset_gaps shipped green locally and hash-failed at the driver)
  - row counts and row multisets with NO coercion: Decimals compare as
    Decimal, floats compare bit-exactly (CLAUDE.md invariant 5 — never
    tolerate cross-engine float drift, make it identical instead)

Additionally, ANY Decimal-typed column in a Spark result is flagged: the
driver's hash is sensitive to decimal physical encodings that differ
between Spark and DuckDB parquet writers even when values match. Emit
exact integers (milli-units) or doubles at the boundary instead.

Exits nonzero if any query mismatches.
"""
import json
import os
import sys

import duckdb


def norm(v):
    if isinstance(v, bytes):
        return v.hex()
    return v


def key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def compare(name, spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    s = sorted([tuple(norm(v) for v in r) for r in spark_rows], key=key)
    d = sorted([tuple(norm(v) for v in r) for r in duck_rows], key=key)
    for i, (a, b) in enumerate(zip(s, d)):
        for j, (x, y) in enumerate(zip(a, b)):
            if type(x) is not type(y) and not (x is None or y is None):
                return (f"python type mismatch at sorted row {i} col "
                        f"{cols[j]}: spark={type(x).__name__}:{x!r} "
                        f"duck={type(y).__name__}:{y!r}")
            if x != y:
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
        order = sorted(range(len(spark.columns)),
                       key=lambda i: spark.columns[i])
        cols_spark = [spark.columns[i] for i in order]
        types_spark = [str(spark.types[i]) for i in order]
        for c, t in zip(cols_spark, types_spark):
            if t.startswith("DECIMAL"):
                failures.append(
                    f"{name}: column {c} is {t} at the result boundary — "
                    f"driver-hash risk; emit milli-unit BIGINT or DOUBLE")
        spark_sorted = con.sql(
            f"SELECT {', '.join(cols_spark)} FROM spark").fetchall()
        if name not in oracles:
            n = len(spark_sorted)
            rows_only.append(f"{name} (rows={n})")
            if n == 0:
                failures.append(f"{name}: rows-only query returned 0 rows")
            continue
        try:
            duck = con.sql(oracles[name])
            dorder = sorted(range(len(duck.columns)),
                            key=lambda i: duck.columns[i])
            cols_duck = [duck.columns[i] for i in dorder]
            types_duck = [str(duck.types[i]) for i in dorder]
            if cols_spark != cols_duck:
                failures.append(
                    f"{name}: column mismatch spark={cols_spark} "
                    f"duck={cols_duck}")
                continue
            if types_spark != types_duck:
                failures.append(
                    f"{name}: declared type mismatch "
                    f"spark={list(zip(cols_spark, types_spark))} "
                    f"duck={list(zip(cols_duck, types_duck))}")
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
