"""Custom stateful streaming operator: per-key LWW materialization with
``applyInPandasWithState`` (Arrow-batched, grouped state).

This is the streaming-native alternative to the foreachBatch+MERGE pipeline for
consumers that want a live change-stream of current winners rather than a lake
table: per doc_id the state holds only ``(lsn, deleted)`` — the winner's payload
always rides the triggering micro-batch, so state stays O(1) per key. An event
only wins if its LSN beats the stored one (delete outranks upsert at equal LSN,
mirroring operators/lww.py's total order), and each win emits one updated row
downstream (update output mode).

Ref analogue: the aggregator's in-stream dedup + downstream notification
(ConceptsAggregator.scala:110-124) — but keyed, LSN-ordered, and restart-safe
via the state store instead of a lossy in-memory HashSet.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("lsn", LongType(), True),
        StructField("deleted", BooleanType(), True),
    ]
)


def streaming_lww(
    events: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "D",
    payload_cols: tuple[str, ...] = ("tokens", "n_tok", "source"),
) -> DataFrame:
    """events stream → stream of per-key winner rows (one per state change).

    Output: key, lsn, op, *payload — op == delete_op rows signal downstream
    deletion (the tombstone event itself is forwarded)."""
    out_fields = [events.schema[key_col], events.schema[lsn_col], events.schema[op_col]]
    out_fields += [events.schema[c] for c in payload_cols]
    out_schema = StructType(out_fields)
    cols = [key_col, lsn_col, op_col, *payload_cols]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            best_lsn, deleted = state.get
        else:
            best_lsn, deleted = None, False
        # Vectorized winner scan: the in-batch winner is the max-LSN event,
        # delete outranking upsert at equal LSN, first arrival winning residual
        # ties — an argmax over numpy arrays, never a per-row Python loop
        # (a hot key can carry millions of events per micro-batch).
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        batch = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        lsns = batch[lsn_col].to_numpy(dtype="int64")
        dels = (batch[op_col] == delete_op).to_numpy()
        top = lsns.max()
        at_top = lsns == top
        top_dels = at_top & dels
        if top_dels.any():
            i, win_del = int(np.flatnonzero(top_dels)[0]), True
        else:
            i, win_del = int(np.flatnonzero(at_top)[0]), False
        if best_lsn is None or top > best_lsn or (
            top == best_lsn and win_del and not deleted
        ):
            state.update((int(top), win_del))
            yield batch.iloc[[i]][list(cols)]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
