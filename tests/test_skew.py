"""Extreme hot-key skew: 90% of events on ONE key must still reduce correctly
(and quickly — the map-side partial aggregation is what prevents the hot key's
raw events from concentrating on a single reducer)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc.apply import CdcPipeline
from concepts_pipeline_spark.operators.lww import lww_latest


def make_skewed(spark, n=200_000, hot_fraction=0.9):
    """Deterministic skewed feed: hot key gets hot_fraction of all events."""
    cut = int(n * hot_fraction)
    return spark.range(0, n, 1, 16).select(
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        F.when(F.col("id") < cut, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 500))
        .alias("doc_id"),
        F.array((F.col("id") % 97).cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )


def test_lww_under_extreme_skew(spark):
    df = make_skewed(spark)
    t0 = time.time()
    out = {r["doc_id"]: r["lsn"] for r in lww_latest(df, ["doc_id"]).collect()}
    elapsed = time.time() - t0
    assert out["HOT"] == 179_999  # max lsn among the hot key's 180k events
    assert len(out) == 501
    # every cold key's winner is its own max lsn
    assert out["k499"] == 199_999
    assert elapsed < 60


def test_replay_under_extreme_skew(spark, tmp_path):
    from __spark_entry__ import TOKENS_SCHEMA

    df = make_skewed(spark, n=50_000)
    pipe = CdcPipeline(
        spark, str(tmp_path / "t"), TOKENS_SCHEMA, ["doc_id"], num_buckets=4,
    )
    res = pipe.apply_batch(df, fence_token="skew:0")
    assert res.stats.applied == 501
    got = {r["doc_id"]: r["tokens"] for r in pipe.final_state().collect()}
    assert got["HOT"] == [(45_000 - 1) % 97]
