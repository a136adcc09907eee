"""Streaming session windows with watermark: the same session_window grouping
used by the batch `event_sessions` query, run as a Structured Streaming job
(append mode, availableNow) — closed sessions must equal the batch result."""

from __future__ import annotations

from pyspark.sql import functions as F


def sessions(df):
    return (
        df.groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def test_streaming_sessions_match_batch(spark, tmp_path):
    # watermarks require TIMESTAMP (the parquet column is TIMESTAMP_NTZ)
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    feed = str(tmp_path / "feed")
    # a real change stream arrives roughly time-ordered; range-partition by ts so
    # file listing order == chronological order (random file order would fragment
    # sessions across the watermark — correct append-mode behavior, but not the
    # scenario under test)
    src.repartitionByRange(4, F.col("ts")).sortWithinPartitions("ts").write.parquet(
        f"file://{feed}"
    )
    # the file source orders by modification time; all parts share one mtime, so
    # pin mtimes ascending with the range order to make arrival chronological
    import os
    import time

    parts = sorted(p for p in os.listdir(feed) if p.endswith(".parquet"))
    base = time.time() - 3600
    for i, p in enumerate(parts):
        os.utime(os.path.join(feed, p), (base + i * 10, base + i * 10))

    batch = {tuple(r) for r in sessions(src).collect()}

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"file://{feed}")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    q = (
        sessions(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", f"file://{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM sessions_out").collect()}

    # append mode only emits sessions closed by the final watermark (max ts - 1h):
    # everything emitted must be a real batch session, and the only missing ones
    # end inside the last watermark horizon
    assert got <= batch
    import datetime

    max_ts = src.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(hours=1)
    for (_u, _start, end, _n) in batch - got:
        assert end >= cutoff
    assert len(got) >= 0.8 * len(batch)
