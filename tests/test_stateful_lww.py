"""applyInPandasWithState streaming LWW: per-key final emission must equal the
batch LWW winner over the same (valid) events, across micro-batch boundaries
and through a restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc.apply import validate_events
from concepts_pipeline_spark.cdc.derive import derived_change_log
from concepts_pipeline_spark.operators.lww import lww_latest
from concepts_pipeline_spark.streaming.stateful import streaming_lww

SF = "/root/testdata/sf0.001"


def land_feed(spark, tmp_path, n_files=3):
    valid, _ = validate_events(derived_change_log(spark, SF))
    feed = str(tmp_path / "feed")
    valid.repartition(n_files).write.parquet(f"file://{feed}")
    return valid, feed


def final_emissions(spark, table_name):
    rows = spark.sql(f"SELECT * FROM {table_name}").collect()
    best = {}
    for r in rows:
        cur = best.get(r["doc_id"])
        if cur is None or r["lsn"] > cur["lsn"]:
            best[r["doc_id"]] = r
    return {
        k: (r["lsn"], r["op"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for k, r in best.items()
    }


def expected_winners(valid):
    win = lww_latest(valid, ["doc_id"])
    return {
        r["doc_id"]: (r["lsn"], r["op"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in win.collect()
    }


def test_streaming_lww_matches_batch(spark, tmp_path):
    valid, feed = land_feed(spark, tmp_path)
    stream = (
        spark.readStream.schema(valid.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"file://{feed}")
    )
    q = (
        streaming_lww(stream)
        .writeStream.format("memory")
        .queryName("lww_out")
        .outputMode("update")
        .option("checkpointLocation", f"file://{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = final_emissions(spark, "lww_out")
    want = expected_winners(valid)
    assert got == want


def test_streaming_lww_state_survives_restart(spark, tmp_path):
    valid, feed = land_feed(spark, tmp_path, n_files=4)
    schema = valid.schema

    def start(sink: list):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"file://{feed}")
        )

        def collect(df, _bid):
            sink.extend(df.collect())

        return (
            streaming_lww(stream)
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", f"file://{tmp_path}/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    # run once to completion, then restart over the same checkpoint: the state
    # store must carry the winners, so the second run emits nothing new
    first_rows: list = []
    q1 = start(first_rows)
    q1.awaitTermination()
    second_rows: list = []
    q2 = start(second_rows)
    q2.awaitTermination()
    assert second_rows == []

    best = {}
    for r in first_rows:
        if r["doc_id"] not in best or r["lsn"] > best[r["doc_id"]]["lsn"]:
            best[r["doc_id"]] = r
    got = {
        k: (r["lsn"], r["op"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for k, r in best.items()
    }
    assert got == expected_winners(valid)
