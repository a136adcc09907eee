"""Property-based soundness of stat-pruned predicate reads (hypothesis):
for ANY schedule of CoW merges, MoR merges (including stale-LSN
redeliveries), deletes, compactions, and z-order rewrites, and ANY
conjunctive range probe, `read_where_all` must return EXACTLY the rows a
full unpruned scan + filter returns. Pruning is an optimization, never a
correctness filter — this fuzzes the delta-bucket keep rule, the
LWW-resolve-before-filter ordering, and the cross-domain stat guard at
once."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

from concepts_pipeline_spark.lake import LakeTable, merge_into
from concepts_pipeline_spark.lake.cluster import cluster_by
from concepts_pipeline_spark.lake.merge import (
    HIDDEN_DELETED, compact,
)

SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("x", IntegerType(), True),
    StructField("s", StringType(), True),
])

KEYS = [f"k{i}" for i in range(12)]
S_VALS = ["aa", "bb", "cc", "dd"]

event = st.tuples(
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=99),          # x
    st.sampled_from(S_VALS),                          # s
    st.sampled_from(["U", "U", "U", "D"]),            # op
    st.integers(min_value=1, max_value=50),           # lsn (collides → stale)
)
step = st.one_of(
    st.tuples(st.just("merge"), st.lists(event, min_size=1, max_size=5),
              st.booleans()),                         # (kind, events, mor?)
    st.tuples(st.just("compact"), st.none(), st.none()),
    st.tuples(st.just("cluster"), st.none(), st.none()),
)
probe = st.one_of(
    st.tuples(st.just("x"), st.integers(0, 99), st.integers(0, 99)),
    st.tuples(st.just("s"), st.sampled_from(S_VALS), st.sampled_from(S_VALS)),
    st.tuples(st.just("doc_id"), st.sampled_from(KEYS), st.sampled_from(KEYS)),
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)
@given(steps=st.lists(step, min_size=2, max_size=6),
       probes=st.lists(probe, min_size=1, max_size=2))
def test_pruned_read_equals_unpruned_filter(spark, tmp_path_factory,
                                            steps, probes):
    root = tmp_path_factory.mktemp("prune")
    t = LakeTable.create(
        str(root / "t"), SCHEMA, ["doc_id"], num_buckets=2,
        properties={"stat_cols": ["x", "s"]},
    )
    n = 0
    for kind, events, mor in steps:
        if kind == "merge":
            n += 1
            rows = [
                (k, None if op == "D" else x, None if op == "D" else s,
                 op, lsn)
                for (k, x, s, op, lsn) in events
            ]
            merge_into(
                spark, t,
                spark.createDataFrame(
                    rows,
                    "doc_id string, x int, s string, op string, lsn long",
                ),
                fence_token=f"m:{n}", lsn_col="lsn",
                strategy="mor" if mor else "cow",
            )
        elif kind == "compact":
            compact(spark, t, 0)
        elif kind == "cluster" and t.manifest().files:
            cluster_by(spark, t, ["x", "s"], bits=3, files_per_bucket=2)

    preds = [(c, min(lo, hi), max(lo, hi)) for c, lo, hi in probes]

    # ground truth: full unpruned scan, LWW-resolved (read() on CoW-only is
    # already one-row-per-key; read_merged handles deltas), exact filter
    from concepts_pipeline_spark.lake.merge import read_merged

    truth = read_merged(spark, t)
    if HIDDEN_DELETED in truth.columns:
        truth = truth.filter(~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)))
    for c, lo, hi in preds:
        truth = truth.filter(F.col(c).between(F.lit(lo), F.lit(hi)))
    want = {(r["doc_id"], r["x"], r["s"]) for r in
            truth.select("doc_id", "x", "s").collect()}

    got_df = t.read_where_all(spark, preds)
    if HIDDEN_DELETED in got_df.columns:
        got_df = got_df.filter(
            ~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)))
    got = {(r["doc_id"], r["x"], r["s"]) for r in
           got_df.select("doc_id", "x", "s").collect()}

    assert got == want, f"pruned read diverged under preds {preds}"
