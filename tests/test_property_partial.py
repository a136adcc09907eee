"""Property-based column-level CDC (hypothesis): for ANY sparse event sequence
and ANY batch partitioning/arrival order, the partial-mode engine equals a
pure-Python per-column LSN-ordered fold (each column applied independently in
event order; deletes clear the row). This is the declarative spec of
update_mode='partial' exercised over the full space of out-of-order schedules
the fixed fixtures in test_partial_columns.py can only sample."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
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

LOG_DDL = ("doc_id string, lsn long, op string, tokens array<int>, "
           "n_tok int, source string")

KEYS = ["a", "b", "c"]

# a sparse event: op, plus WHICH columns it states (tokens+n_tok pair with
# the pair invariant; source independent)
event = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["I", "U", "U", "D"]),       # deletes less frequent
    st.booleans(),                                # states tokens(+n_tok)?
    st.lists(st.integers(0, 50), min_size=1, max_size=3),
    st.booleans(),                                # states source?
    st.sampled_from(["s1", "s2"]),
)
events_list = st.lists(event, min_size=1, max_size=25)
# batch assignment and arrival permutation seed
splits = st.lists(st.integers(0, 2), min_size=1, max_size=4)


def python_oracle(rows):
    """Event-order fold with per-column semantics: an upsert sets only its
    stated columns; a delete clears the whole row (and its column memory)."""
    state: dict = {}
    live: dict = {}
    for doc, lsn, op, toks, n_tok, src in sorted(rows, key=lambda r: r[1]):
        if op == "D":
            state[doc] = {}
            live[doc] = False
            continue
        cur = state.setdefault(doc, {})
        if toks is not None:
            cur["tokens"] = tuple(toks)
            cur["n_tok"] = n_tok
        if src is not None:
            cur["source"] = src
        live[doc] = True
    return {
        k: (
            v.get("tokens"),
            v.get("n_tok"),
            v.get("source"),
        )
        for k, v in state.items()
        if live.get(k)
    }


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(evs=events_list, split=splits, reverse=st.booleans(),
       strategy=st.sampled_from(["cow", "mor"]))
def test_any_sparse_replay_matches_python_fold(
    spark, tmp_path_factory, evs, split, reverse, strategy
):
    rows = []
    for lsn, (doc, op, has_t, toks, has_s, src) in enumerate(evs):
        if op == "D":
            rows.append((doc, lsn, op, None, None, None))
        else:
            rows.append(
                (
                    doc, lsn, op,
                    toks if has_t else None,
                    len(toks) if has_t else None,
                    src if has_s else None,
                )
            )

    root = tmp_path_factory.mktemp("pprop")
    pipe = CdcPipeline(
        spark, str(root / "t"), SCHEMA, ["doc_id"],
        quarantine_path=str(root / "q"),
        num_buckets=2, update_mode="partial", strategy=strategy,
    )
    n_batches = max(split) + 1
    order = range(n_batches)
    if reverse:  # adversarial arrival: newest batch first
        order = reversed(range(n_batches))
    for j, b in enumerate(order):
        batch_rows = [r for i, r in enumerate(rows) if split[i % len(split)] == b]
        batch = (
            spark.createDataFrame(batch_rows, LOG_DDL)
            if batch_rows
            else spark.createDataFrame([], LOG_DDL)
        )
        pipe.apply_batch(batch, fence_token=f"pp:{j}")

    got = {
        r["doc_id"]: (
            tuple(r["tokens"]) if r["tokens"] is not None else None,
            r["n_tok"],
            r["source"],
        )
        for r in pipe.final_state().collect()
    }
    assert got == python_oracle(rows)
