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
        winner = None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                lsn = int(getattr(row, lsn_col))
                is_del = getattr(row, op_col) == delete_op
                if best_lsn is None or lsn > best_lsn or (
                    lsn == best_lsn and is_del and not deleted
                ):
                    best_lsn, deleted = lsn, is_del
                    winner = row
        if winner is not None:
            state.update((best_lsn, deleted))
            yield pd.DataFrame([tuple(getattr(winner, c) for c in cols)], columns=cols)

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
