"""Column-level CDC (update_mode='partial'): per-column LWW registers.

Sparse after-images — an event sets only the columns it changed, NULL means
"no statement". Correct apply under out-of-order batches needs per-column
versions (the hidden _colv map) plus a persisted delete barrier (_dlsn):
row-level LSN gating would (a) drop a late-arriving old assignment to a
column no newer event ever set and (b) classify-but-not-apply scenarios
around deletes. These tests pin the fold operator, the merge resolution,
batch-split invariance, validation, and exactly-once fencing.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc.apply import CdcPipeline, valid_event_expr
from concepts_pipeline_spark.operators.lww import lww_fold_partial
from tests.test_lake_table import TOKENS_SCHEMA

EV_DDL = (
    "doc_id string, lsn long, op string, tokens array<int>, "
    "n_tok int, source string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, EV_DDL)


def _pipe(spark, tmp_path, name="pt", **kw):
    kw.setdefault("quarantine_path", str(tmp_path / f"{name}-q"))
    return CdcPipeline(
        spark, str(tmp_path / name), TOKENS_SCHEMA, ["doc_id"],
        num_buckets=4, update_mode="partial", **kw,
    )


def ev(doc, lsn, op="U", tokens=None, n_tok=None, source=None):
    return (doc, lsn, op, tokens, n_tok, source)


def _state(pipe):
    return {
        r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
        for r in pipe.final_state().collect()
    }


# ---------------------------------------------------------------- fold unit


def test_fold_per_column_winners_and_delete_barrier(spark):
    df = _batch(
        spark,
        [
            ev("a", 1, tokens=[1], n_tok=1),
            ev("a", 2, source="s1"),
            ev("a", 3, source="s2"),          # newest source
            ev("b", 1, tokens=[9], n_tok=1),
            ev("b", 2, "D"),                  # barrier kills lsn-1 tokens
            ev("b", 3, source="web"),         # revives with source only
            ev("c", 5, tokens=[7], n_tok=1),
            ev("c", 9, "D"),                  # net delete
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in lww_fold_partial(
            df, ["doc_id"], val_cols=["tokens", "n_tok", "source"]
        ).collect()
    }
    a = out["a"]
    assert a["tokens"] == [1] and a["n_tok"] == 1 and a["source"] == "s2"
    assert a["_colv"] == {"tokens": 1, "n_tok": 1, "source": 3}
    assert a["_dlsn"] is None and a["op"] == "U" and a["lsn"] == 3
    b = out["b"]
    assert b["tokens"] is None and b["source"] == "web"
    assert b["_colv"] == {"source": 3}
    assert b["_dlsn"] == 2 and b["op"] == "U" and b["lsn"] == 3
    c = out["c"]
    assert c["op"] == "D" and c["_colv"] == {} and c["tokens"] is None
    assert c["_dlsn"] == 9 and c["lsn"] == 9


def test_fold_same_lsn_delete_outranks_upsert(spark):
    df = _batch(spark, [ev("a", 5, "U", tokens=[1], n_tok=1), ev("a", 5, "D")])
    row = lww_fold_partial(
        df, ["doc_id"], val_cols=["tokens", "n_tok", "source"]
    ).collect()[0]
    assert row["op"] == "D" and row["tokens"] is None


def test_fold_is_one_aggregation_no_window(spark):
    df = _batch(spark, [ev("a", 1, tokens=[1], n_tok=1)])
    plan = (
        lww_fold_partial(df, ["doc_id"], val_cols=["tokens", "n_tok", "source"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    # partial + final aggregate around ONE exchange: hot keys combine map-side
    assert plan.count("Exchange") == 1


# ------------------------------------------------------- out-of-order apply


def test_late_old_assignment_still_applies(spark, tmp_path):
    """A column assignment older than the row's LSN must apply when no newer
    event ever set that column — the case a row-level LSN gate gets wrong."""
    pipe = _pipe(spark, tmp_path)
    pipe.apply_batch(_batch(spark, [ev("a", 20, source="web")]), "b1")
    pipe.apply_batch(
        _batch(spark, [ev("a", 10, tokens=[1, 2], n_tok=2)]), "b2"
    )
    assert _state(pipe) == {"a": ([1, 2], 2, "web")}


def test_redelivered_old_assignment_does_not_overwrite(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    pipe.apply_batch(_batch(spark, [ev("a", 20, source="web")]), "b1")
    # stale duplicate of an OLDER source assignment, delivered later
    pipe.apply_batch(_batch(spark, [ev("a", 12, source="api")]), "b2")
    assert _state(pipe) == {"a": (None, None, "web")}


def test_delete_barrier_across_batches(spark, tmp_path):
    """Delete arrives first; an older column assignment must stay dead, a
    newer one must revive the row with only its column."""
    pipe = _pipe(spark, tmp_path)
    pipe.apply_batch(_batch(spark, [ev("a", 15, "D"), ev("b", 15, "D")]), "b1")
    pipe.apply_batch(
        _batch(
            spark,
            [
                ev("a", 10, tokens=[3], n_tok=1),  # pre-delete: stays dead
                ev("b", 20, source="rss"),         # post-delete: revives
            ],
        ),
        "b2",
    )
    assert _state(pipe) == {"b": (None, None, "rss")}


def test_tombstone_then_revival_drops_pre_delete_columns(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    pipe.apply_batch(
        _batch(spark, [ev("a", 1, tokens=[1], n_tok=1, source="s0")]), "b1"
    )
    pipe.apply_batch(_batch(spark, [ev("a", 2, "D")]), "b2")
    pipe.apply_batch(_batch(spark, [ev("a", 3, source="s1")]), "b3")
    # tokens from lsn 1 must NOT resurrect through the revival
    assert _state(pipe) == {"a": (None, None, "s1")}


def test_batch_split_invariance(spark, tmp_path):
    """Any partition of the event log into any batch arrival order yields the
    same final state (the spec is a pure function of the event set)."""
    events = [
        ev("a", 1, tokens=[1], n_tok=1),
        ev("a", 4, source="s1"),
        ev("a", 6, "D"),
        ev("a", 8, tokens=[2, 3], n_tok=2),
        ev("b", 2, source="x"),
        ev("b", 3, tokens=[5], n_tok=1),
        ev("b", 7, "D"),
        ev("c", 5, tokens=[9], n_tok=1),
        ev("c", 9, source="y"),
    ]
    expected = {"a": ([2, 3], 2, None), "c": ([9], 1, "y")}
    for i, order in enumerate(itertools.permutations(range(3))):
        pipe = _pipe(spark, tmp_path, name=f"split{i}")
        batches = [events[0::3], events[1::3], events[2::3]]
        for j, b in enumerate(order):
            pipe.apply_batch(_batch(spark, batches[b]), f"s{i}:{j}")
        assert _state(pipe) == expected, f"order {order}"


# ------------------------------------------------------------- validation


def test_partial_validation_rules(spark, tmp_path):
    rows = [
        ev("ok-sparse", 1, source="s"),                     # valid: no statement
        ev("ok-full", 2, tokens=[1, 2], n_tok=2),           # valid
        ev("orphan-n", 3, n_tok=2),                         # n_tok without tokens
        ev("oov", 4, tokens=[999999], n_tok=1),             # out of vocab
        ev("mismatch", 5, tokens=[1], n_tok=3),             # count wrong
        ev("no-count", 6, tokens=[1]),                      # tokens need n_tok
        ev("bad-op", 7, "X", source="s"),
    ]
    df = _batch(spark, rows).withColumn(
        "reject_reason", valid_event_expr(partial=True)
    )
    got = {r["doc_id"]: r["reject_reason"] for r in df.collect()}
    assert got == {
        "ok-sparse": None,
        "ok-full": None,
        "orphan-n": "n_tok_mismatch",
        "oov": "token_out_of_vocab",
        "mismatch": "n_tok_mismatch",
        "no-count": "n_tok_mismatch",
        "bad-op": "unknown_op",
    }
    pipe = _pipe(spark, tmp_path, name="val")
    pipe.apply_batch(_batch(spark, rows), "v1")
    q = {
        r["reject_reason"]: r["n"]
        for r in pipe.quarantine.read(spark)
        .groupBy("reject_reason").agg(F.count("*").alias("n")).collect()
    }
    assert q == {"n_tok_mismatch": 3, "token_out_of_vocab": 1, "unknown_op": 1}
    assert _state(pipe) == {
        "ok-sparse": (None, None, "s"),
        "ok-full": ([1, 2], 2, None),
    }


# ------------------------------------------------------ fencing / guards


def test_partial_fence_replay_is_noop(spark, tmp_path):
    pipe = _pipe(spark, tmp_path, name="fence")
    b = _batch(spark, [ev("a", 1, source="s")])
    r1 = pipe.apply_batch(b, "f1")
    v = pipe.target.current_version()
    r2 = pipe.apply_batch(b, "f1")  # replay
    assert r2.stats.skipped and pipe.target.current_version() == v
    assert not r1.stats.skipped


def test_partial_merge_requires_folded_source(spark, tmp_path):
    """merge_into(update_mode='partial') refuses a table without the hidden
    version-vector columns."""
    from concepts_pipeline_spark.lake import LakeTable
    from concepts_pipeline_spark.lake.merge import merge_into

    t = LakeTable.create(
        str(tmp_path / "plain"), TOKENS_SCHEMA, ["doc_id"], num_buckets=2
    )
    src = _batch(spark, [ev("a", 1, source="s")])
    with pytest.raises(ValueError, match="partial"):
        merge_into(spark, t, src, lsn_col="lsn", update_mode="partial")


# ------------------------------------------------- DML on a partial table


def test_predicate_dml_maintains_column_registers(spark, tmp_path):
    """delete_where/update_where are whole-row merges at max(_lsn)+1; on a
    partial-mode table they must keep the per-column registers coherent:
    the DML states every column at its LSN, and a DML delete advances the
    persisted barrier so pre-delete sparse assignments stay dead."""
    from concepts_pipeline_spark.lake.mutate import delete_where, update_where

    pipe = _pipe(spark, tmp_path, name="dml")
    pipe.apply_batch(
        _batch(
            spark,
            [
                ev("a", 10, tokens=[1], n_tok=1, source="s0"),
                ev("b", 11, tokens=[2], n_tok=1, source="s0"),
            ],
        ),
        "d1",
    )
    # UPDATE ... SET source='fixed' WHERE doc_id='a'  (stamped lsn 12)
    update_where(
        spark, pipe.target, {"source": F.lit("fixed")},
        F.col("doc_id") == "a", fence_token="dml-u",
    )
    # DELETE WHERE doc_id='b'  (stamped lsn 13)
    delete_where(spark, pipe.target, F.col("doc_id") == "b", fence_token="dml-d")

    # a sparse source assignment OLDER than the DML must lose to it
    pipe.apply_batch(_batch(spark, [ev("a", 11, source="late-old")]), "d2")
    # a pre-delete sparse assignment must stay dead; a post-delete one revives
    pipe.apply_batch(
        _batch(
            spark,
            [ev("b", 12, source="pre-delete"), ev("b", 30, tokens=[9], n_tok=1)],
        ),
        "d3",
    )
    assert _state(pipe) == {
        "a": ([1], 1, "fixed"),
        "b": ([9], 1, None),
    }
    # and a sparse assignment NEWER than the DML wins over it
    pipe.apply_batch(_batch(spark, [ev("a", 40, source="newer")]), "d4")
    assert _state(pipe)["a"] == ([1], 1, "newer")


# -------------------------------------------------------------- streaming


def test_streaming_partial_with_kill_and_resume(spark, tmp_path):
    """Structured-Streaming apply of a sparse feed under update_mode='partial':
    kill the stream mid-replay, restart from checkpoint — per-column state
    converges to the event-order fold with no duplicate or lost applies."""
    from concepts_pipeline_spark.streaming import run_stream

    events = [
        ev("a", 1, tokens=[1], n_tok=1),
        ev("a", 5, source="s1"),
        ev("b", 2, tokens=[4], n_tok=1, source="s0"),
        ev("b", 6, "D"),
        ev("b", 7, source="s2"),
        ev("c", 3, source="x"),
        ev("c", 8, tokens=[9, 9], n_tok=2),
        ev("a", 9, tokens=[2], n_tok=1),
    ]
    feed = str(tmp_path / "feed")
    # several small files => several micro-batches at maxFilesPerTrigger=1
    _batch(spark, events).repartition(4).write.parquet(f"file://{feed}")

    pipe = _pipe(spark, tmp_path, name="stream")
    ckpt = str(tmp_path / "ckpt")

    crashed = {"n": 0}

    def boom(batch_id, df):
        if batch_id == 1 and crashed["n"] == 0:
            crashed["n"] = 1
            raise RuntimeError("injected crash")

    h = run_stream(spark, pipe, feed, ckpt, name="pstream", on_batch=boom)
    try:
        h.query.awaitTermination()
    except Exception:
        pass
    # resume from checkpoint; the killed micro-batch replays exactly once
    h2 = run_stream(spark, pipe, feed, ckpt, name="pstream")
    h2.query.awaitTermination()

    assert crashed["n"] == 1
    assert _state(pipe) == {
        "a": ([2], 1, "s1"),
        "b": (None, None, "s2"),
        "c": ([9, 9], 2, "x"),
    }


def test_partial_schema_evolution_new_column(spark, tmp_path):
    """A later batch carrying a brand-new payload column: the fold registers
    it, the merge evolves the table schema, old rows read NULL, and the
    per-column ordering applies to the new register like any other."""
    pipe = _pipe(spark, tmp_path, name="evo")
    pipe.apply_batch(
        _batch(spark, [ev("a", 1, tokens=[1], n_tok=1, source="s0")]), "e1"
    )
    wide = spark.createDataFrame(
        [("a", 5, "U", None, None, None, "en"), ("b", 6, "U", None, None, "s1", "de")],
        EV_DDL + ", lang string",
    )
    pipe.apply_batch(wide, "e2")
    got = {
        r["doc_id"]: (r["tokens"], r["source"], r["lang"])
        for r in pipe.final_state().collect()
    }
    assert got == {"a": ([1], "s0", "en"), "b": (None, "s1", "de")}
    # ordering on the new register: an older redelivered lang loses
    wide_old = spark.createDataFrame(
        [("a", 3, "U", None, None, None, "fr")], EV_DDL + ", lang string"
    )
    pipe.apply_batch(wide_old, "e3")
    got = {
        r["doc_id"]: r["lang"] for r in pipe.final_state().collect()
    }
    assert got == {"a": "en", "b": "de"}


def test_partial_wap_audit_gate(spark, tmp_path):
    """Write-audit-publish over a partial pipeline: the audit sees the fully
    merged candidate (per-column resolution included); a rejected batch moves
    nothing and leaves the fence unclaimed."""
    from concepts_pipeline_spark.cdc.apply import BatchAuditError

    pipe = _pipe(spark, tmp_path, name="wap")

    def no_mass_delete(s, branch, result):
        from concepts_pipeline_spark.lake.merge import HIDDEN_DELETED

        live = branch.read(s).filter(
            ~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False))
        ).count()
        return live > 0

    pipe.apply_batch_wap(
        _batch(spark, [ev("a", 1, tokens=[1], n_tok=1), ev("b", 2, source="s")]),
        "w1", audit=no_mass_delete,
    )
    assert _state(pipe) == {"a": ([1], 1, None), "b": (None, None, "s")}
    v = pipe.target.current_version()

    poison = _batch(spark, [ev("a", 10, "D"), ev("b", 11, "D")])
    with pytest.raises(BatchAuditError):
        pipe.apply_batch_wap(poison, "w2", audit=no_mass_delete)
    assert pipe.target.current_version() == v
    assert not pipe.target.has_fence_token("w2")
    assert _state(pipe) == {"a": ([1], 1, None), "b": (None, None, "s")}
    # a corrected batch reuses the unclaimed fence
    pipe.apply_batch_wap(
        _batch(spark, [ev("a", 10, "D"), ev("b", 11, source="s2")]),
        "w2", audit=no_mass_delete,
    )
    assert _state(pipe) == {"b": (None, None, "s2")}


# ------------------------------------------------- Debezium TOAST columns


def test_debezium_toast_sentinel_feeds_partial_mode(spark, tmp_path):
    """Postgres TOAST: Debezium fills unchanged unfetched columns with a
    sentinel string — the canonical real-world sparse after-image. With
    toast_sentinel set, parse_debezium maps it to NULL ("no statement"),
    and a partial-mode pipeline keeps the target's value where whole-row
    replace would have nulled it."""
    import json

    from concepts_pipeline_spark.cdc.feed import parse_debezium
    from tests.test_lake_table import TOKENS_SCHEMA

    SENT = "__debezium_unavailable_value"

    def envelope(op, lsn, after):
        return json.dumps(
            {"payload": {"op": op, "after": after, "before": None,
                         "source": {"lsn": lsn}}}
        )

    lines = [
        envelope("c", 1, {"doc_id": "a", "tokens": [1, 2], "n_tok": 2,
                          "source": "s0"}),
        # update that re-states tokens but NOT source (TOASTed, unchanged)
        envelope("u", 2, {"doc_id": "a", "tokens": [3], "n_tok": 1,
                          "source": SENT}),
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    parsed = parse_debezium(df, TOKENS_SCHEMA, toast_sentinel=SENT)
    rows = {r["lsn"]: r.asDict() for r in parsed.collect()}
    assert rows[2]["source"] is None and rows[2]["tokens"] == [3]
    assert rows[1]["source"] == "s0"

    pipe = _pipe(spark, tmp_path, name="toast")
    pipe.apply_batch(parsed, "t1")
    # source survives the TOASTed update; tokens replaced
    assert _state(pipe) == {"a": ([3], 1, "s0")}


# ------------------------------------------- derived surfaces over partial


def test_partial_changes_outbox_actions(spark, tmp_path):
    """The per-key action classification (outbox) under per-column
    resolution: late-but-winning column = updated, losing redelivery =
    suppressed, delete = deleted."""
    pipe = _pipe(
        spark, tmp_path, name="obx",
        changes_path=str(tmp_path / "obx-changes"),
    )
    pipe.apply_batch(
        _batch(spark, [ev("a", 10, tokens=[1], n_tok=1),
                       ev("b", 11, source="s")]), "o1"
    )
    pipe.apply_batch(
        _batch(spark, [
            ev("a", 5, source="old-but-wins"),   # older lsn, fresh column
            ev("b", 3, source="loses"),          # older lsn, loses
            ev("b", 20, "D"),
        ]), "o2",
    )
    acts = {
        (r["doc_id"], r["fence_token"]): r["action"]
        for r in pipe.changes.read(spark).collect()
    }
    assert acts[("a", "o1")] == "inserted" and acts[("b", "o1")] == "inserted"
    assert acts[("a", "o2")] == "updated"      # the old assignment APPLIED
    assert acts[("b", "o2")] == "deleted"


def test_partial_snapshot_diff_and_incremental_view(spark, tmp_path):
    """CDF + incremental aggregation over a partial-mode table: hidden
    register columns stay invisible to the diff, and the view's ± fold
    equals the recompute across sparse updates."""
    from concepts_pipeline_spark.lake.diff import snapshot_diff
    from concepts_pipeline_spark.lake.view import IncrementalAggView

    pipe = _pipe(spark, tmp_path, name="ivm")
    pipe.apply_batch(
        _batch(spark, [ev("a", 1, tokens=[1], n_tok=1, source="s1"),
                       ev("b", 2, tokens=[2, 2], n_tok=2, source="s2")]), "v1"
    )
    view = IncrementalAggView(
        spark, pipe.target, str(tmp_path / "view"),
        group_cols=["source"], sum_cols={"toks": "n_tok"},
    )
    view.refresh()
    v_from = pipe.target.current_version()
    # sparse moves: a's source moves s1→s2 (tokens untouched); b deleted
    pipe.apply_batch(
        _batch(spark, [ev("a", 5, source="s2"), ev("b", 6, "D")]), "v2"
    )
    d = snapshot_diff(spark, pipe.target, v_from, pipe.target.current_version())
    assert not [c for c in d.columns if c.startswith("_")], d.columns
    kinds = {(r["doc_id"], r["change_type"]) for r in d.collect()}
    assert kinds == {("a", "update"), ("b", "delete")}
    view.refresh()
    got = {r["source"]: (r["n_rows"], r["toks"])
           for r in view.read().collect()}
    assert got == {"s2": (1, 1)}


# ---------------------------------------------------------- merge-on-read


def _mor_pipe(spark, tmp_path, name="pmor", **kw):
    return _pipe(spark, tmp_path, name=name, strategy="mor", **kw)


def test_partial_mor_replay_and_compaction_equals_cow(spark, tmp_path):
    """MoR register deltas + read-side per-column fold equal the CoW partial
    merge on the same out-of-order schedule; compaction (full and tiered)
    folds registers associatively without changing the resolved state."""
    from concepts_pipeline_spark.lake.merge import compact, compact_tiered

    events = [
        ev("a", 1, tokens=[1], n_tok=1),
        ev("a", 4, source="s1"),
        ev("a", 6, "D"),
        ev("a", 8, tokens=[2, 3], n_tok=2),
        ev("b", 2, source="x"),
        ev("b", 3, tokens=[5], n_tok=1),
        ev("b", 7, "D"),
        ev("c", 5, tokens=[9], n_tok=1),
        ev("c", 9, source="y"),
    ]
    expected = {"a": ([2, 3], 2, None), "c": ([9], 1, "y")}
    mor = _mor_pipe(spark, tmp_path)
    cow = _pipe(spark, tmp_path, name="cowtwin")
    for j, chunk in enumerate([events[2::3], events[0::3], events[1::3]]):
        mor.apply_batch(_batch(spark, chunk), f"m:{j}")
        cow.apply_batch(_batch(spark, chunk), f"c:{j}")
    assert any(f.kind == "delta" for f in mor.target.manifest().files)
    assert _state(mor) == expected == _state(cow)

    compact_tiered(spark, mor.target, fanout=1)
    assert _state(mor) == expected
    compact(spark, mor.target, max_delta_files_per_bucket=0)
    m = mor.target.manifest()
    assert all(f.kind == "base" for f in m.files)
    assert _state(mor) == expected
    # post-compaction ordering: an older redelivered assignment still loses,
    # a genuinely-new column on a never-again-set slot still wins
    mor.apply_batch(
        _batch(spark, [ev("a", 5, source="old"), ev("c", 6, n_tok=None,
                                                    tokens=None, source=None)]),
        "m:post",
    )
    assert _state(mor)["a"] == ([2, 3], 2, None)


def test_partial_mor_point_lookup_and_pruned_read(spark, tmp_path):
    """read_for_keys and read_where on a partial MoR table route through the
    register fold (resolve_rows dispatch): lookups see per-column state, and
    value predicates are applied only AFTER resolution."""
    from concepts_pipeline_spark.lake.merge import read_for_keys

    pipe = _mor_pipe(spark, tmp_path, name="look")
    pipe.apply_batch(
        _batch(spark, [ev("a", 1, tokens=[1], n_tok=1, source="s1"),
                       ev("b", 2, tokens=[2], n_tok=1, source="s2")]), "l1"
    )
    # sparse delta moves a's source without restating tokens
    pipe.apply_batch(_batch(spark, [ev("a", 5, source="s9")]), "l2")
    got = {
        r["doc_id"]: (r["tokens"], r["source"])
        for r in read_for_keys(spark, pipe.target, ["a"]).collect()
    }
    assert got == {"a": ([1], "s9")}
    # read_where on source: the raw base row for 'a' says s1 — filtering
    # before resolution would wrongly return it; after resolution it is s9
    t = pipe.target
    rows = t.read_where(spark, "source", "s1").collect()
    assert [r["doc_id"] for r in rows] == []
    rows = t.read_where(spark, "source", "s9").collect()
    assert [(r["doc_id"], r["tokens"]) for r in rows] == [("a", [1])]


# --------------------------------------- replication / index composition


def test_partial_table_replication_and_token_index(spark, tmp_path):
    """Downstream surfaces compose with a partial-mode primary: the replica
    mirrors the LOGICAL state (its own hidden columns — register machinery
    stays private to the primary), digests match, and a TokenIndex maintained
    from the primary's CDF answers lookups over sparse updates."""
    from concepts_pipeline_spark.lake.index import TokenIndex
    from concepts_pipeline_spark.lake.replicate import Replica, verify_replica

    pipe = _pipe(spark, tmp_path, name="prim")
    pipe.apply_batch(
        _batch(spark, [ev("a", 1, tokens=[7, 8], n_tok=2, source="s1"),
                       ev("b", 2, tokens=[8], n_tok=1, source="s2")]), "r1"
    )
    rep = Replica(spark, pipe.target, str(tmp_path / "rep"), num_buckets=2)
    rep.refresh()
    assert verify_replica(spark, pipe.target, rep)

    ix = TokenIndex(spark, pipe.target, str(tmp_path / "ix"), num_shards=2)
    ix.refresh()
    assert {r["doc_id"] for r in ix.lookup([8]).collect()} == {"a", "b"}

    # sparse updates: a's tokens restated (drops 8), b deleted
    pipe.apply_batch(
        _batch(spark, [ev("a", 5, tokens=[7], n_tok=1), ev("b", 6, "D")]), "r2"
    )
    rep.refresh()
    assert verify_replica(spark, pipe.target, rep)
    got = {
        r["doc_id"]: (r["tokens"], r["source"])
        for r in rep.table.read(spark).filter(~F.coalesce(
            F.col("_deleted"), F.lit(False))).collect()
    }
    assert got == {"a": ([7], "s1")}
    ix.refresh()
    assert ix.lookup([8]).count() == 0
    assert {r["doc_id"] for r in ix.lookup([7]).collect()} == {"a"}


def test_cluster_by_preserves_registers_on_partial_mor(spark, tmp_path):
    """z-order maintenance on a partial-mode MoR table must resolve via the
    register fold — a whole-row max-LSN pick would null columns held by other
    register rows and drop delete barriers (review finding, fixed via
    resolve_rows dispatch in lake/cluster.py)."""
    from concepts_pipeline_spark.lake.cluster import cluster_by

    pipe = _mor_pipe(spark, tmp_path, name="clus")
    pipe.apply_batch(
        _batch(spark, [ev("a", 10, tokens=[1], n_tok=1),
                       ev("b", 11, tokens=[2], n_tok=1, source="s0"),
                       ev("c", 12, tokens=[3], n_tok=1)]), "c1"
    )
    pipe.apply_batch(
        _batch(spark, [ev("a", 20, source="x"), ev("c", 21, "D")]), "c2"
    )
    before = _state(pipe)
    assert before == {"a": ([1], 1, "x"), "b": ([2], 1, "s0")}
    cluster_by(spark, pipe.target, ["n_tok"], bits=2)
    assert _state(pipe) == before
    # barrier survives the rewrite: c's pre-delete assignment stays dead
    pipe.apply_batch(_batch(spark, [ev("c", 15, source="zombie")]), "c3")
    assert _state(pipe) == before


def test_cli_lookup_and_scan_hide_register_columns(spark, tmp_path, capsys):
    """CLI lookup/scan on a partial-mode table must not leak _colv/_dlsn
    (review finding: only _lsn/_deleted were stripped)."""
    import json

    from concepts_pipeline_spark.__main__ import main

    pipe = _pipe(spark, tmp_path, name="clihide")
    pipe.apply_batch(_batch(spark, [ev("a", 1, tokens=[1], n_tok=1)]), "h1")
    assert main(["lookup", "--table", str(tmp_path / "clihide"),
                 "--key", "a"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] and not any(
        k.startswith("_") for r in out["rows"] for k in r
    )


def test_cli_debezium_toast_replay_partial(spark, tmp_path, capsys):
    """--feed-format debezium --toast-sentinel … --update-mode partial: the
    TOAST path is reachable end-to-end from the CLI (review finding: the
    sentinel was previously unreachable outside tests)."""
    import json

    from concepts_pipeline_spark.__main__ import main

    SENT = "__debezium_unavailable_value"

    def env(op, lsn, after):
        return json.dumps({"payload": {"op": op, "after": after,
                                       "before": None, "source": {"lsn": lsn}}})

    lines = [
        env("c", 1, {"doc_id": "a", "tokens": [1, 2], "n_tok": 2,
                     "source": "s0"}),
        env("u", 2, {"doc_id": "a", "tokens": [3], "n_tok": 1,
                     "source": SENT}),
    ]
    feed = tmp_path / "dbz"
    feed.mkdir()
    (feed / "dump.jsonl").write_text("\n".join(lines) + "\n")
    target = str(tmp_path / "t")
    assert main([
        "replay", "--feed", f"file://{feed}", "--target", target,
        "--feed-format", "debezium", "--toast-sentinel", SENT,
        "--update-mode", "partial", "--quarantine", str(tmp_path / "q"),
    ]) == 0
    capsys.readouterr()
    assert main(["lookup", "--table", target, "--key", "a"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"][0]["tokens"] == [3]
    assert out["rows"][0]["source"] == "s0"  # TOASTed column preserved


def test_rename_column_refused_on_partial_tables(spark, tmp_path):
    """_colv keys registers by column NAME in data — a metadata-only rename
    cannot remap them, so the values would silently read as never-set.
    Refused loudly; DROP COLUMN stays allowed (stale entries are ignored and
    the dropped-name tombstone blocks resurrection)."""
    pipe = _pipe(spark, tmp_path, name="ddl")
    pipe.apply_batch(
        _batch(spark, [ev("a", 1, tokens=[1], n_tok=1, source="s")]), "d1"
    )
    with pytest.raises(ValueError, match="partial"):
        pipe.target.rename_column("source", "origin")
    pipe.target.drop_column("source")
    got = {r["doc_id"]: r.asDict() for r in pipe.final_state().collect()}
    assert "source" not in got["a"] and got["a"]["tokens"] == [1]
    # registers for surviving columns still order correctly post-DDL (the
    # feed no longer carries the dropped column — re-adding it is refused
    # by the dropped-name tombstone, which a separate assert pins)
    narrow = "doc_id string, lsn long, op string, tokens array<int>, n_tok int"
    pipe.apply_batch(
        spark.createDataFrame([("a", 5, "U", [2], 1)], narrow), "d2"
    )
    pipe.apply_batch(
        spark.createDataFrame([("a", 3, "U", [9], 1)], narrow), "d3"
    )
    got = {r["doc_id"]: r["tokens"] for r in pipe.final_state().collect()}
    assert got == {"a": [2]}
    # resurrection of the dropped name stays refused on the partial path too
    from concepts_pipeline_spark.lake.schema import SchemaEvolutionError

    with pytest.raises(SchemaEvolutionError, match="previously dropped"):
        pipe.apply_batch(
            _batch(spark, [ev("a", 7, tokens=[1], n_tok=1, source="zomb")]),
            "d4",
        )


def test_partial_expiry_and_rollback_composition(spark, tmp_path):
    """Lifecycle ops over a partial table: expire_snapshots keeps the state
    byte-identical (registers live in data files like any column), and
    rollback() rewinds fences so the rolled-back batch replays to the same
    per-column resolution."""
    pipe = _mor_pipe(spark, tmp_path, name="life")
    pipe.apply_batch(
        _batch(spark, [ev("a", 1, tokens=[1], n_tok=1, source="s0"),
                       ev("b", 2, tokens=[2], n_tok=1)]), "l1"
    )
    from concepts_pipeline_spark.lake.merge import compact_tiered
    compact_tiered(spark, pipe.target, fanout=1)
    pipe.apply_batch(
        _batch(spark, [ev("a", 5, source="s1"), ev("b", 6, "D")]), "l2"
    )
    v_after_l2 = pipe.target.current_version()
    want = _state(pipe)
    assert want == {"a": ([1], 1, "s1")}

    pipe.target.expire_snapshots(keep_last=1)
    assert _state(pipe) == want

    # roll back past l2, replay it: fences rewound, same resolution
    pipe.apply_batch(_batch(spark, [ev("a", 9, tokens=[7], n_tok=1)]), "l3")
    pipe.target.rollback(v_after_l2)
    assert _state(pipe) == want
    assert not pipe.target.has_fence_token("l3")
    pipe.apply_batch(_batch(spark, [ev("a", 9, tokens=[7], n_tok=1)]), "l3")
    assert _state(pipe) == {"a": ([7], 1, "s1")}
