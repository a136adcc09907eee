"""Structured Streaming foreachBatch driver: exactly-once CDC apply with checkpointing.

The reference's incremental mode is an SQS-triggered Lambda that applies a small batch
of change events (ref: aggregator/src/main/scala/weco/concepts/aggregator/SQSMain.scala:43-57);
redelivery + idempotent upserts stand in for exactly-once. Here the change feed is a
file-source stream (a landed WAL), and exactly-once is real:

- the checkpoint gives resumable offsets (no lost batches);
- the fence token ``<name>:<batch_id>`` recorded inside the target's atomic manifest
  commit makes retried/replayed batches no-ops (no duplicate applies).

foreachBatch is at-least-once on failure — the fence turns it into exactly-once, which
is tested by killing the query mid-replay and restarting from the checkpoint
(tests/test_streaming_resume.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..cdc.apply import ApplyResult, CdcPipeline
from ..cdc.generator import CHANGE_LOG_SCHEMA


@dataclass
class StreamHandle:
    query: StreamingQuery
    applied: list[tuple[int, ApplyResult]]

    def await_done(self, timeout: float | None = None) -> None:
        self.query.awaitTermination(timeout)

    def stop(self) -> None:
        if self.query.isActive:
            self.query.stop()


def run_stream(
    spark: SparkSession,
    pipe: CdcPipeline,
    source_path: str,
    checkpoint_path: str,
    name: str = "cdc-apply",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    on_batch: Callable[[int, DataFrame], None] | None = None,
    schema=None,
    feed_format: str = "parquet",
    toast_sentinel: str | None = None,
    after_batch: Callable[[int, ApplyResult], None] | None = None,
    audit: Callable[[SparkSession, object, ApplyResult], bool] | None = None,
) -> StreamHandle:
    """Tail a landed change-log directory and apply each micro-batch exactly once.

    ``on_batch`` is a test hook invoked *before* apply (e.g. to inject a crash).
    ``feed_format``: parquet (default), jsonl (NDJSON, .gz native), or csv.
    ``after_batch(batch_id, result)`` runs after each apply — the cascade hook
    for downstream maintenance (e.g. ``IncrementalAggView.refresh()``: the
    view's own fences make the whole chain exactly-once even if the stream
    dies between the apply and the hook — the next trigger's hook folds the
    missed commits; tests/test_incremental_view.py streaming test).
    ``audit`` switches every micro-batch to write-audit-publish
    (CdcPipeline.apply_batch_wap): the batch stages on a branch, the audit
    sees the fully merged candidate state, and main only moves on publish. A
    rejection raises BatchAuditError inside foreachBatch, stopping the stream
    with main untouched and the fence unclaimed — restart replays the SAME
    micro-batch from the checkpoint (deterministic offsets), so a corrected
    audit (or feed fix) resumes exactly where the gate closed.
    """
    from ..cdc.feed import read_change_feed

    applied: list[tuple[int, ApplyResult]] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_id, batch_df)
        if audit is not None:
            res = pipe.apply_batch_wap(
                batch_df, fence_token=f"{name}:{batch_id}", audit=audit
            )
        else:
            res = pipe.apply_batch(batch_df, fence_token=f"{name}:{batch_id}")
        applied.append((batch_id, res))
        if after_batch is not None:
            after_batch(batch_id, res)

    reader = read_change_feed(
        spark,
        f"file://{source_path}",
        feed_format=feed_format,
        toast_sentinel=toast_sentinel,
        schema=schema or CHANGE_LOG_SCHEMA,
        streaming=True,
        options={"maxFilesPerTrigger": str(max_files_per_trigger)},
    )
    writer = (
        reader.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"file://{checkpoint_path}")
        .queryName(name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return StreamHandle(query=q, applied=applied)
