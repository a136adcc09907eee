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
    # The driver's gate canonicalizes via PANDAS (sort columns by name, then
    # hash cell values), so dtype-level divergence matters: DuckDB HUGEINT
    # (sum over CASE) reaches pandas as float64 while Spark's bigint stays
    # int64 — numerically equal, hash-different. Round 2 shipped exactly that
    # bug because the old fetchall() path coerced both to Python int. Mirror
    # the driver: normalize ints and floats to DISTINCT reprs so int-vs-float
    # divergence fails locally too.
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, dict, np.ndarray)):
        raise TypeError(
            f"unhashable cell {type(v).__name__} — the driver gate would crash; "
            "serialize array/map output columns with to_json on both sides"
        )
    if v is None or (isinstance(v, float) and v != v):
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (np.floating, float)):
        return ("float", repr(float(v)))
    if isinstance(v, (np.integer, int)):
        return ("int", int(v))
    return str(v)


def norm_pdf(pdf):
    """Canonicalize a pandas DataFrame the way the driver's gate does:
    columns sorted by name, order-insensitive multiset of dtype-tagged rows."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    return cols, Counter(
        tuple(norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


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
            s_pdf = df.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            # rows-only queries still pass through the driver's canonicalizer —
            # their cells must be hashable too
            try:
                norm_pdf(s_pdf)
            except TypeError as e:
                failures.append(name)
                print(f"FAIL  {name}: {e}")
                continue
            print(f"ok*   {name}: rows-only ({len(s_pdf)} rows)")
            continue
        try:
            d_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(s_pdf.columns) != sorted(d_pdf.columns):
            failures.append(name)
            print(
                f"FAIL  {name}: cols spark={sorted(s_pdf.columns)} "
                f"duckdb={sorted(d_pdf.columns)}"
            )
            continue
        if len(s_pdf) != len(d_pdf):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(s_pdf)} duckdb={len(d_pdf)}")
            continue
        try:
            (_, sn), (_, dn) = norm_pdf(s_pdf), norm_pdf(d_pdf)
        except TypeError as e:
            failures.append(name)
            print(f"FAIL  {name}: {e}")
            continue
        if sn != dn:
            failures.append(name)
            diff_s = list((sn - dn).items())[:3]
            diff_d = list((dn - sn).items())[:3]
            print(f"FAIL  {name}: value mismatch ({len(s_pdf)} rows)")
            print(f"      spark-only: {diff_s}")
            print(f"      duckdb-only: {diff_d}")
        else:
            print(f"ok    {name}: {len(s_pdf)} rows match")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall oracles match")


if __name__ == "__main__":
    main()
