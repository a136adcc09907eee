"""Property-based temporal correctness (hypothesis): for ANY change log,
scd2_history and asof_join equal pure-Python brute-force folds. Guards the
no-op collapse, tombstone, tie, and missing-state edges beyond the fixed
fixtures in test_temporal.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from concepts_pipeline_spark.operators.temporal import asof_join, scd2_history

KEYS = ["a", "b"]
LOG_DDL = "doc_id string, lsn long, op string, v string"

event = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(["x", "y", None]),  # payload (None only meaningful on D)
)
events_list = st.lists(event, min_size=1, max_size=14)


def _log(evs):
    # unique monotonic LSNs by position
    return [
        (k, i + 1, op, None if op == "D" else pv or "x")
        for i, (k, op, pv) in enumerate(evs)
    ]


def brute_scd2(rows):
    """Pure-python SCD2 fold: replay per key, open/close versions."""
    out = []
    by_key: dict[str, list] = {}
    for k, lsn, op, v in sorted(rows, key=lambda r: r[1]):
        by_key.setdefault(k, []).append((lsn, op, v))
    for k, evs in by_key.items():
        state = None          # None = absent, else payload
        open_ver = None       # (valid_from, payload)
        for lsn, op, v in evs:
            if op == "D":
                if state is None:
                    continue  # delete of absent key: no-op
                out.append((k, open_ver[1], open_ver[0], lsn, False))
                state, open_ver = None, None
            else:
                if state is not None and state == v:
                    continue  # no-op upsert
                if open_ver is not None:
                    out.append((k, open_ver[1], open_ver[0], lsn, False))
                state, open_ver = v, (lsn, v)
        if open_ver is not None:
            out.append((k, open_ver[1], open_ver[0], None, True))
    return sorted(out)


def brute_asof(rows, probes):
    """Pure-python as-of: latest state event with lsn <= probe, tombstone
    means deleted."""
    out = {}
    for pk, plsn in probes:
        best = None
        for k, lsn, op, v in rows:
            if k == pk and lsn <= plsn and (best is None or lsn > best[0]):
                best = (lsn, op, v)
        if best is None or best[1] == "D":
            out[(pk, plsn)] = (None, None)
        else:
            out[(pk, plsn)] = (best[2], best[0])
    return out


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events_list)
def test_scd2_matches_bruteforce(spark, evs):
    rows = _log(evs)
    got = scd2_history(
        spark.createDataFrame(rows, LOG_DDL), ["doc_id"], ["v"]
    ).collect()
    got_set = sorted(
        (r["doc_id"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in got
    )
    assert got_set == brute_scd2(rows)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events_list)
def test_asof_matches_bruteforce(spark, evs):
    rows = _log(evs)
    n = len(rows)
    # probes straddle every interesting point: before, at, between, after
    probes = [(k, lsn) for k in KEYS for lsn in (0, 1, (n + 1) // 2, n, n + 5)]
    probe_df = spark.createDataFrame(probes, "doc_id string, plsn long")
    state_df = spark.createDataFrame(rows, LOG_DDL)
    got = asof_join(
        probe_df, state_df, ["doc_id"], "plsn", "lsn", ["v"], op_col="op"
    ).collect()
    got_map = {(r["doc_id"], r["plsn"]): (r["v"], r["as_of_lsn"]) for r in got}
    assert got_map == brute_asof(rows, probes)


# ---------------------------------------------------------------------------
# array_patch merge mode: random add/del patch sequences vs a python set fold
# ---------------------------------------------------------------------------

patch_step = st.tuples(
    st.sampled_from(["a", "b"]),                       # key
    st.lists(st.integers(0, 9), max_size=3),           # adds
    st.lists(st.integers(0, 9), max_size=3),           # dels
)
patch_script = st.lists(patch_step, min_size=1, max_size=8)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(patch_script)
def test_array_patch_matches_set_fold(spark, tmp_path_factory, script):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    from concepts_pipeline_spark.lake import LakeTable
    from concepts_pipeline_spark.lake.merge import merge_into

    tmp = tmp_path_factory.mktemp("patchprop")
    schema = StructType([
        StructField("k", StringType(), False),
        StructField("vals", ArrayType(IntegerType()), True),
    ])
    t = LakeTable.create(str(tmp / "t"), schema, ["k"], num_buckets=2)

    expect: dict[str, set[int]] = {}
    for i, (k, adds, dels) in enumerate(script):
        merge_into(
            spark, t,
            spark.createDataFrame(
                [(k, adds, dels)],
                "k string, add_ids array<int>, del_ids array<int>",
            ).withColumn("op", F.lit("U")),
            update_mode="array_patch",
            patch_cols={"vals": ("add_ids", "del_ids")},
            fence_token=f"s{i}",
        )
        cur = expect.setdefault(k, set())
        expect[k] = (cur | set(adds)) - set(dels)

    got = {r["k"]: list(r["vals"]) for r in t.read(spark).collect()}
    assert got == {k: sorted(v) for k, v in expect.items()}
