"""Local replica of the driver's correctness gate: run every __spark_entry__
query on Spark and its oracle on DuckDB at the same sf, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from concepts_pipeline_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    # The driver's gate canonicalizes with pandas sort_values + value hashing,
    # which crashes on unhashable cells (lists/dicts). Mirror that strictly:
    # a query emitting raw array/map columns must FAIL here, not be silently
    # tuple-normalized (that masking is what broke round 1's gate).
    if isinstance(v, (list, dict)):
        raise TypeError(
            f"unhashable cell {type(v).__name__} — the driver gate would crash; "
            "serialize array/map output columns with to_json on both sides"
        )
    if isinstance(v, float):
        return repr(v)
    return v


def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently matching nothing would report success
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        print(f"known: {sorted(qs)}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            # rows-only queries still pass through the driver's canonicalizer —
            # their cells must be hashable too
            try:
                norm_rows(s_rows, s_cols)
            except TypeError as e:
                failures.append(name)
                print(f"FAIL  {name}: {e}")
                continue
            print(f"ok*   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL  {name}: cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(s_rows)} duckdb={len(d_rows)}")
            continue
        try:
            sn, dn = norm_rows(s_rows, s_cols), norm_rows(d_rows, d_cols)
        except TypeError as e:
            failures.append(name)
            print(f"FAIL  {name}: {e}")
            continue
        if sn != dn:
            failures.append(name)
            diff_s = list((sn - dn).items())[:3]
            diff_d = list((dn - sn).items())[:3]
            print(f"FAIL  {name}: value mismatch ({len(s_rows)} rows)")
            print(f"      spark-only: {diff_s}")
            print(f"      duckdb-only: {diff_d}")
        else:
            print(f"ok    {name}: {len(s_rows)} rows match")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall oracles match")


if __name__ == "__main__":
    main()
