"""Downstream change-outbox tests (ref: aggregator publishIds routes only
updated-not-noop ids downstream, ConceptsAggregator.scala:120-124; batched
publication: TopicPublisher.scala:23-58)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from concepts_pipeline_spark.cdc.apply import CdcPipeline

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)

LOG_SCHEMA = ("lsn long, op string, doc_id string, tokens array<int>, "
              "n_tok int, source string")


def ev(lsn, op, doc, toks=None):
    toks = toks if toks is not None else ([1, 2] if op != "D" else None)
    n = len(toks) if toks is not None else None
    return (lsn, op, doc, toks, n, "s")


def make_pipe(spark, tmp_path):
    return CdcPipeline(
        spark,
        target_path=str(tmp_path / "t"),
        target_schema=SCHEMA,
        key_cols=["doc_id"],
        lineage_path=str(tmp_path / "l"),
        changes_path=str(tmp_path / "c"),
        num_buckets=4,
        salt_buckets=2,
    )


def test_only_effective_changes_published(spark, tmp_path):
    pipe = make_pipe(spark, tmp_path)
    b1 = spark.createDataFrame(
        [ev(1, "I", "a"), ev(2, "I", "b"), ev(3, "I", "c")], LOG_SCHEMA
    )
    pipe.apply_batch(b1, fence_token="t:1")
    # b2: a updated (new tokens), b re-sent identically (noop), c deleted,
    #     d inserted, plus a STALE event for a (lsn below a's applied lsn)
    b2 = spark.createDataFrame(
        [ev(10, "U", "a", [9, 9]), ev(11, "U", "b", [1, 2]), ev(12, "D", "c"),
         ev(13, "I", "d"), ev(0, "U", "a", [7])],
        LOG_SCHEMA,
    )
    pipe.apply_batch(b2, fence_token="t:2")

    changes = {
        (r["fence_token"], r["doc_id"]): r["action"]
        for r in pipe.changes.read(spark).collect()
    }
    assert changes == {
        ("t:1", "a"): "inserted",
        ("t:1", "b"): "inserted",
        ("t:1", "c"): "inserted",
        ("t:2", "a"): "updated",
        ("t:2", "c"): "deleted",
        ("t:2", "d"): "inserted",
    }  # noop (b) and stale events publish nothing


def test_replayed_batch_publishes_nothing_twice(spark, tmp_path):
    pipe = make_pipe(spark, tmp_path)
    b = spark.createDataFrame([ev(1, "I", "a")], LOG_SCHEMA)
    pipe.apply_batch(b, fence_token="t:1")
    pipe.apply_batch(b, fence_token="t:1")  # fenced replay
    rows = pipe.changes.read(spark).collect()
    assert len(rows) == 1
