"""snapshot_diff: CDF-style classified changes between two snapshots.

The reference has no changed-rows surface (its TopicPublisher emits ids for the
live batch only, ref: aggregator/.../TopicPublisher.scala:18-33); the lake's
immutable snapshots make the diff answerable after the fact. These tests pin the
classification contract, the bucket-level pruning, MoR resolution, and
schema-evolution conformance.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from concepts_pipeline_spark.lake import LakeTable, merge_into, snapshot_diff
from concepts_pipeline_spark.lake.diff import _changed_buckets

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)


def df_of(spark, rows, with_op=False, schema=None):
    base = schema or SCHEMA
    if with_op:
        base = StructType(list(base.fields) + [StructField("op", StringType(), False)])
    return spark.createDataFrame(rows, base)


def changes(spark, t, v_from, v_to):
    return {
        r["doc_id"]: (r["change_type"], r["tokens"], r["n_tok"], r["source"])
        for r in snapshot_diff(spark, t, v_from, v_to).collect()
    }


def test_insert_update_delete_classification(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=4)
    t.overwrite(df_of(spark, [
        ("a", [1], 1, "loc"), ("b", [2], 1, "loc"), ("c", [3], 1, "loc"),
    ]))
    v1 = t.current_version()
    merge_into(spark, t, df_of(spark, [
        ("a", [1, 9], 2, "loc", "U"),          # update
        ("b", [2], 1, "loc", "U"),             # noop — must NOT appear in diff
        ("c", None, None, None, "D"),          # delete
        ("d", [7], 1, "wikidata", "I"),        # insert
    ], with_op=True), fence_token="b1")
    v2 = t.current_version()

    got = changes(spark, t, v1, v2)
    assert got == {
        "a": ("update", [1, 9], 2, "loc"),
        "c": ("delete", [3], 1, "loc"),
        "d": ("insert", [7], 1, "wikidata"),
    }
    # diff of a snapshot against itself is empty
    assert snapshot_diff(spark, t, v2, v2).count() == 0


def test_multi_commit_span_collapses_intermediate_states(spark, tmp_path):
    """Diff spans several commits: a key changed and changed back vanishes;
    insert-then-delete across the span vanishes; only net changes remain."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=4)
    t.overwrite(df_of(spark, [("a", [1], 1, "loc"), ("b", [2], 1, "loc")]))
    v1 = t.current_version()
    merge_into(spark, t, df_of(spark, [
        ("a", [5], 1, "loc", "U"),
        ("x", [8], 1, "loc", "I"),
    ], with_op=True), fence_token="m1")
    merge_into(spark, t, df_of(spark, [
        ("a", [1], 1, "loc", "U"),            # back to the v1 value
        ("x", None, None, None, "D"),         # insert+delete within the span
        ("b", None, None, None, "D"),         # net delete
    ], with_op=True), fence_token="m2")
    v3 = t.current_version()
    got = changes(spark, t, v1, v3)
    assert got == {"b": ("delete", [2], 1, "loc")}


def test_bucket_pruning_reads_only_touched_buckets(spark, tmp_path):
    """A single-key commit changes one bucket; the diff must compute from that
    bucket alone (unchanged buckets cannot contribute — files are immutable)."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=8)
    t.overwrite(df_of(spark, [
        (f"doc{i:04d}", [i], 1, "loc") for i in range(200)
    ]))
    v1 = t.current_version()
    merge_into(spark, t, df_of(
        spark, [("doc0007", [99], 1, "loc", "U")], with_op=True
    ), fence_token="one")
    v2 = t.current_version()
    m1, m2 = t.manifest(v1), t.manifest(v2)
    touched = _changed_buckets(m1, m2)
    assert len(touched) == 1  # copy-on-write rewrote exactly one bucket
    got = changes(spark, t, v1, v2)
    assert got == {"doc0007": ("update", [99], 1, "loc")}


def test_mor_deltas_resolve_before_diff(spark, tmp_path):
    """Under merge-on-read the diff must compare RESOLVED states, not raw
    files: a delta superseding a base row is one update, not insert+delete."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=4)
    t.overwrite(df_of(spark, [("a", [1], 1, "loc"), ("b", [2], 1, "loc")]))
    v1 = t.current_version()
    src = df_of(spark, [
        ("a", [4, 4], 2, "loc", "U"),
        ("b", None, None, None, "D"),
    ], with_op=True).withColumn("lsn", F.lit(10).cast("long"))
    merge_into(spark, t, src, strategy="mor", lsn_col="lsn", fence_token="d1")
    v2 = t.current_version()
    got = changes(spark, t, v1, v2)
    assert got == {
        "a": ("update", [4, 4], 2, "loc"),
        "b": ("delete", [2], 1, "loc"),
    }


def test_diff_across_schema_evolution(spark, tmp_path):
    """A column added between the snapshots: old side conforms to the evolved
    schema (NULL for the new column), so a row whose only change is the new
    column's value classifies as update."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=4)
    t.overwrite(df_of(spark, [("a", [1], 1, "loc")]))
    v1 = t.current_version()
    evolved = StructType(list(SCHEMA.fields) + [StructField("lang", StringType(), True)])
    src = spark.createDataFrame(
        [("a", [1], 1, "loc", "en", "U")],
        StructType(list(evolved.fields) + [StructField("op", StringType(), False)]),
    )
    merge_into(spark, t, src, fence_token="ev")
    v2 = t.current_version()
    rows = {r["doc_id"]: r for r in snapshot_diff(spark, t, v1, v2).collect()}
    assert rows["a"]["change_type"] == "update"
    assert rows["a"]["lang"] == "en"


def test_span_walk_excludes_maintenance_churn(spark, tmp_path):
    """A compact/cluster/rescale commit inside a span flags every bucket at
    the endpoints; the maintenance-aware walk (span_data_buckets) must keep
    only the DATA commits' buckets — and live_pair over a maintenance-only
    span must read zero buckets (empty frames), not the whole table."""
    from concepts_pipeline_spark.lake.cluster import cluster_by
    from concepts_pipeline_spark.lake.diff import live_pair, span_data_buckets
    from concepts_pipeline_spark.lake.merge import compact

    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=4)
    t.overwrite(df_of(spark, [
        (f"k{i}", [i], 1, "s") for i in range(40)
    ]))
    v0 = t.current_version()

    # MoR batch -> compact -> cluster: two maintenance commits after one data
    ev = spark.createDataFrame(
        [("k1", [9, 9], 2, "s", "U", 10)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, lsn long",
    )
    merge_into(spark, t, ev, fence_token="d1", lsn_col="lsn", strategy="mor")
    v_data = t.current_version()
    compact(spark, t, 0)
    cluster_by(spark, t, ["n_tok"], bits=3, files_per_bucket=2)
    v_maint = t.current_version()
    assert v_maint == v_data + 2

    m = t.manifest
    # maintenance-only span: zero data buckets, empty live_pair frames
    assert span_data_buckets(t, m(v_data), m(v_maint)) == set()
    old, new = live_pair(spark, t, v_data, v_maint)
    assert old.count() == 0 and new.count() == 0
    # endpoint diff alone would have flagged every bucket (the cluster
    # rewrote all files)
    assert len(_changed_buckets(m(v_data), m(v_maint))) == 4

    # mixed span: exactly the data commit's buckets survive the walk
    got = span_data_buckets(t, m(v0), m(v_maint))
    assert got == _changed_buckets(m(v0), m(v_data))
    assert len(got) < 4

    # the classified diff across the maintenance span is still exact
    assert changes(spark, t, v0, v_maint) == {
        "k1": ("update", [9, 9], 2, "s"),
    }
