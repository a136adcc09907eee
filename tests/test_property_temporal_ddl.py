"""Property-based composition of TAGS × RESCALE × COLUMN DDL × EXPIRY ×
CLUSTER (hypothesis): for ANY schedule of merges, tag pins, bucket rescales,
column drops/renames, z-order rewrites, and aggressive expiry (keep_last=1,
zero orphan grace), every
live tag must still read BYTE-IDENTICALLY the state — including the schema —
that was visible when it was pinned, and main must equal the python fold
projected onto the current schema timeline.

This composes test_property_refs (refs × expiry) with test_property_ddl
(DDL × replay): the corruption modes only the composition can catch are
(a) a rescale rewriting the live generation while an old tag still points at
pre-rescale files that expiry then sweeps, and (b) a metadata-only DROP/RENAME
leaking forward into a tag pinned before it (the tag must still show the
dropped column's values under its original name)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from concepts_pipeline_spark.lake.merge import merge_into, rescale_buckets
from tests.test_branch import _table

KEYS = ["a", "b", "c", "d"]

op = st.sampled_from(
    ["merge", "merge", "tag", "rescale_up", "rescale_down",
     "drop_col", "rename_col", "expire", "cluster"]
)
ops_list = st.lists(op, min_size=4, max_size=14)


def _fold(events, cols):
    """Python fold of the event log → {doc_id: row-dict projected on cols}.
    `cols` maps visible name -> payload field ('tokens'/'n_tok'/'source')."""
    state = {}
    for lsn, key, kind, toks in events:
        if kind == "D":
            state[key] = None
        else:
            state[key] = {"tokens": toks, "n_tok": len(toks), "source": "s"}
    out = {}
    for k, payload in state.items():
        if payload is None:
            continue
        out[k] = tuple(
            tuple(payload[src]) if src == "tokens" else payload[src]
            for _, src in sorted(cols.items())
        )
    return out


def _read(spark, t, cols, tag=None):
    df = t.read_tag(spark, tag) if tag else t.read(spark)
    if "_deleted" in df.columns:
        df = df.filter(~F.coalesce("_deleted", F.lit(False)))
    names = sorted(cols)
    got = {}
    for r in df.select("doc_id", *names).collect():
        got[r["doc_id"]] = tuple(
            tuple(r[n]) if isinstance(r[n], list) else r[n] for n in names
        )
    return got


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)
@given(ops=ops_list)
def test_tags_survive_rescale_ddl_expiry_schedules(
    spark, tmp_path_factory, ops
):
    root = tmp_path_factory.mktemp("tref")
    t = _table(spark, root, num_buckets=2)
    lsn = 0
    events = []                   # python-side log of everything main saw
    cols = {"tokens": "tokens", "n_tok": "n_tok", "source": "source"}
    # tag name -> (expected state, column map AT PIN TIME)
    tags: dict[str, tuple[dict, dict]] = {}
    n_tag = 0
    buckets = 2

    for i, kind in enumerate(ops):
        key = KEYS[i % len(KEYS)]
        if kind == "merge":
            lsn += 1
            delete = i % 5 == 4
            events.append((lsn, key, "D" if delete else "U",
                           None if delete else [lsn]))
            # the feed tracks the table's schema timeline, as a real CDC
            # feed must: a dropped column disappears from the envelope
            # (re-adding it is refused by the tombstone — pinned in
            # test_column_ddl), a renamed one arrives under the new name
            payload = {"tokens": None if delete else [lsn],
                       "n_tok": None if delete else 1,
                       "source": None if delete else "s"}
            ddl = ["doc_id string"]
            row = [key]
            for name, src in sorted(cols.items()):
                typ = "array<int>" if src == "tokens" else (
                    "int" if src == "n_tok" else "string")
                ddl.append(f"{name} {typ}")
                row.append(payload[src])
            ddl += ["op string", "lsn long"]
            row += ["D" if delete else "U", lsn]
            merge_into(
                spark, t,
                spark.createDataFrame([tuple(row)], ", ".join(ddl)),
                fence_token=f"f:{lsn}", lsn_col="lsn",
            )
        elif kind == "tag":
            n_tag += 1
            t.create_tag(f"rel{n_tag}")
            tags[f"rel{n_tag}"] = (_fold(events, cols), dict(cols))
        elif kind == "rescale_up":
            buckets = min(buckets * 2, 16)
            rescale_buckets(spark, t, buckets)
        elif kind == "rescale_down":
            buckets = max(buckets // 2, 1)
            rescale_buckets(spark, t, buckets)
        elif kind == "drop_col" and "n_tok" in cols:
            t.drop_column("n_tok")
            del cols["n_tok"]
        elif kind == "rename_col" and "source" in cols:
            t.rename_column("source", "origin")
            cols["origin"] = cols.pop("source")
        elif kind == "expire":
            t.expire_snapshots(keep_last=1, orphan_grace_seconds=0.0)
        elif kind == "cluster":
            # z-rewrite mid-schedule: a logical no-op that must compose with
            # every tag/rescale/DDL/expiry interleaving. Clustering on a
            # droppable column (n_tok, while it exists) also exercises the
            # stale-grid guard in write_data_files once a later drop lands.
            from concepts_pipeline_spark.lake.cluster import cluster_by

            zcols = ["doc_id"] + (["n_tok"] if "n_tok" in cols else [])
            cluster_by(spark, t, zcols, bits=3, files_per_bucket=2)

        # invariants after EVERY op:
        assert _read(spark, t, cols) == _fold(events, cols), (
            f"main diverged after op {i} ({kind})"
        )
        for name, (want, pin_cols) in tags.items():
            assert _read(spark, t, pin_cols, tag=name) == want, (
                f"tag {name} diverged after op {i} ({kind}); "
                f"pinned cols {sorted(pin_cols)}"
            )

    # terminal: aggressive expiry then one more full re-check
    t.expire_snapshots(keep_last=1, orphan_grace_seconds=0.0)
    assert _read(spark, t, cols) == _fold(events, cols)
    for name, (want, pin_cols) in tags.items():
        assert _read(spark, t, pin_cols, tag=name) == want
