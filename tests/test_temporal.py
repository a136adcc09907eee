"""Temporal operators: SCD2 history, AS-OF join, sequence gap audit.

Edge-case fixtures (delete-reinsert gaps, no-op collapse, tombstone-as-of,
cross-block and whole-missing-block gaps) plus plan properties: the as-of
join must not plan a nested-loop/cartesian, and scd2's two window passes must
share one Exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from concepts_pipeline_spark.operators.temporal import (
    asof_join,
    scd2_history,
    sequence_gap_audit,
)

LOG_SCHEMA = "doc_id string, lsn long, op string, v string"


def _hist(spark, rows):
    log = spark.createDataFrame(rows, LOG_SCHEMA)
    out = scd2_history(log, ["doc_id"], ["v"]).collect()
    return sorted(
        (r["doc_id"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out
    )


def test_scd2_versions_and_noop_collapse(spark):
    rows = [
        ("a", 1, "I", "x"),
        ("a", 2, "U", "x"),   # no-op: same payload → no version
        ("a", 3, "U", "y"),   # new version, closes 1
        ("b", 4, "U", "p"),   # upsert-as-insert
    ]
    assert _hist(spark, rows) == [
        ("a", "x", 1, 3, False),
        ("a", "y", 3, None, True),
        ("b", "p", 4, None, True),
    ]


def test_scd2_delete_closes_without_opening(spark):
    rows = [
        ("a", 1, "I", "x"),
        ("a", 2, "D", None),  # closes version 1
        ("a", 3, "D", None),  # no-op: already deleted
        ("a", 5, "I", "x"),   # re-insert: same payload, NEW version (gap 2-5)
        ("c", 7, "D", None),  # delete of absent key: nothing at all
    ]
    assert _hist(spark, rows) == [
        ("a", "x", 1, 2, False),
        ("a", "x", 5, None, True),
    ]


def test_scd2_single_exchange(spark):
    log = spark.createDataFrame([("a", 1, "I", "x")], LOG_SCHEMA)
    plan = scd2_history(log, ["doc_id"], ["v"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


ASOF_STATE = "k string, slsn long, op string, val string"
ASOF_PROBE = "k string, plsn long"


def _asof(spark, state_rows, probe_rows):
    state = spark.createDataFrame(state_rows, ASOF_STATE)
    probe = spark.createDataFrame(probe_rows, ASOF_PROBE)
    out = asof_join(
        probe, state, ["k"], "plsn", "slsn", ["val"], op_col="op"
    ).collect()
    return {(r["k"], r["plsn"]): (r["val"], r["as_of_slsn"]) for r in out}


def test_asof_inclusive_latest_and_miss(spark):
    state = [("a", 2, "U", "v2"), ("a", 5, "U", "v5"), ("b", 9, "U", "w")]
    probe = [("a", 1), ("a", 2), ("a", 4), ("a", 7), ("b", 8), ("z", 3)]
    got = _asof(spark, state, probe)
    assert got == {
        ("a", 1): (None, None),   # before first state
        ("a", 2): ("v2", 2),      # inclusive at-or-before
        ("a", 4): ("v2", 2),
        ("a", 7): ("v5", 5),
        ("b", 8): (None, None),   # state only later
        ("z", 3): (None, None),   # unknown key survives (left join)
    }


def test_asof_tombstone_means_deleted(spark):
    state = [("a", 2, "U", "v2"), ("a", 5, "D", None), ("a", 8, "U", "v8")]
    probe = [("a", 4), ("a", 6), ("a", 9)]
    got = _asof(spark, state, probe)
    assert got == {
        ("a", 4): ("v2", 2),
        ("a", 6): (None, None),   # deleted as of 5
        ("a", 9): ("v8", 8),
    }


def test_asof_no_nested_loop(spark):
    state = spark.createDataFrame([("a", 2, "U", "x")], ASOF_STATE)
    probe = spark.createDataFrame([("a", 4)], ASOF_PROBE)
    plan = asof_join(
        probe, state, ["k"], "plsn", "slsn", ["val"], op_col="op"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union-and-carry: exactly one hash exchange per input branch, no join op
    assert "Join" not in plan, plan


def _gaps(spark, seqs, block_size):
    df = spark.createDataFrame([(s,) for s in seqs], "seq long")
    out = sequence_gap_audit(df, "seq", block_size=block_size).collect()
    return sorted((r["gap_start"], r["gap_end"], r["missing"]) for r in out)


def test_gap_audit_intra_cross_and_whole_missing_blocks(spark):
    # block_size=4: blocks {0:0-3, 1:4-7, 2:8-11, 3:12-15, 4:16-19}
    seqs = [1, 2, 4, 7, 17, 19]  # gaps: 3 (intra→cross boundary), 5-6, 8-16, 18
    assert _gaps(spark, seqs, 4) == [
        (3, 3, 1),     # cross-block: block0 max=2 → block1 min=4
        (5, 6, 2),     # intra-block 1
        (8, 16, 9),    # spans whole missing blocks 2 and 3
        (18, 18, 1),   # intra-block 4
    ]


def test_gap_audit_duplicates_and_dense(spark):
    assert _gaps(spark, [5, 5, 6, 6, 7], 4) == []  # dups fine, no gaps
    assert _gaps(spark, [9], 4) == []              # single value: no anchor
