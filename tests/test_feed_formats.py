"""Change-feed source formats: the same replay from parquet, gzipped NDJSON,
and CSV must produce the identical final state (ref: the reference's bulk
source is gzipped NDJSON — Scroll.scala:8-25 / WorksSnapshotSource.scala)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc import CdcPipeline, generate_change_log
from concepts_pipeline_spark.cdc.feed import read_change_feed
from concepts_pipeline_spark.cdc.generator import CHANGE_LOG_SCHEMA
from concepts_pipeline_spark.streaming import run_stream
from tests.test_cdc_apply import TARGET_SCHEMA, engine_state


@pytest.fixture(scope="module")
def log_df(spark):
    return generate_change_log(
        spark, num_events=1500, num_keys=120, seed=23, num_batches=2,
        max_tokens=8, dup_pct=5, malformed_pct=3,
    ).drop("batch_id")


def replay(spark, tmp_path, feed, tag):
    pipe = CdcPipeline(
        spark, str(tmp_path / f"t-{tag}"), TARGET_SCHEMA, ["doc_id"],
        num_buckets=4, salt_buckets=2,
    )
    pipe.apply_batch(feed, fence_token=f"{tag}:all")
    return engine_state(pipe.final_state())


def test_jsonl_gz_and_csv_feeds_match_parquet(spark, tmp_path, log_df):
    base = str(tmp_path / "feeds")
    log_df.coalesce(2).write.mode("overwrite").parquet(f"file://{base}/pq")
    log_df.coalesce(2).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(f"file://{base}/jsonl")
    # CSV carries the token array as a JSON string column
    log_df.select(
        "lsn", "op", "doc_id",
        F.to_json("tokens").alias("tokens"), "n_tok", "source", "event_ts",
    ).coalesce(2).write.mode("overwrite").option("header", "true").csv(
        f"file://{base}/csv"
    )

    schema = CHANGE_LOG_SCHEMA
    schema = type(schema)([f for f in schema.fields if f.name != "batch_id"])
    want = replay(spark, tmp_path, read_change_feed(
        spark, f"{base}/pq", "parquet", schema), "pq")
    got_j = replay(spark, tmp_path, read_change_feed(
        spark, f"{base}/jsonl", "jsonl", schema), "jsonl")
    got_c = replay(spark, tmp_path, read_change_feed(
        spark, f"{base}/csv", "csv", schema), "csv")
    assert got_j == want
    assert got_c == want
    assert len(want) > 0

    with pytest.raises(ValueError, match="unknown feed format"):
        read_change_feed(spark, f"{base}/pq", "orc3000")


def test_streaming_from_jsonl_feed(spark, tmp_path, log_df):
    base = str(tmp_path / "sfeed")
    log_df.coalesce(4).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(f"file://{base}/jsonl")
    schema = CHANGE_LOG_SCHEMA
    schema = type(schema)([f for f in schema.fields if f.name != "batch_id"])
    pipe = CdcPipeline(
        spark, str(tmp_path / "t-stream"), TARGET_SCHEMA, ["doc_id"],
        num_buckets=4, salt_buckets=2,
    )
    h = run_stream(
        spark, pipe, f"{base}/jsonl", str(tmp_path / "ckpt"),
        name="jsonl-stream", max_files_per_trigger=2, schema=schema,
        feed_format="jsonl",
    )
    h.query.awaitTermination()
    want = replay(spark, tmp_path, log_df, "ref")
    assert engine_state(pipe.final_state()) == want
