"""Property-based ref-machinery safety (hypothesis): under ANY interleaving of
merges, tag create/drop, branch create/commit/publish/drop, and aggressive
expiry (keep_last=1, zero orphan grace), every live ref stays readable and
correct — main equals the python fold of published events, every live tag
still reads the exact state it pinned, and no reachable file is vacuumed.
This is where a pinning bug (expiry dropping a tag's file, publish losing a
fence, a stale branch resurrecting state) would corrupt silently."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from concepts_pipeline_spark.lake.merge import merge_into
from concepts_pipeline_spark.lake.table import CommitConflict, LakeTable
from tests.test_branch import SRC_SCHEMA, _events, _table

KEYS = ["a", "b", "c"]

# op alphabet: (kind, key-ish payload selector)
op = st.sampled_from(
    ["merge", "tag", "droptag", "branch_cycle", "branch_abandon", "expire"]
)
ops_list = st.lists(op, min_size=3, max_size=12)


def _fold_state(events):
    state = {}
    for lsn, key, op_, toks in events:
        if op_ == "D":
            state[key] = None
        else:
            state[key] = toks
    return {k: v for k, v in state.items() if v is not None}


def _read_state(spark, t, tag=None):
    df = t.read_tag(spark, tag) if tag else t.read(spark)
    if "_deleted" in df.columns:  # absent until the first merge writes it
        df = df.filter(~F.coalesce("_deleted", F.lit(False)))
    return {r["doc_id"]: list(r["tokens"]) for r in df.collect()}


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=ops_list)
def test_refs_survive_any_schedule(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("refs")
    t = _table(spark, root, num_buckets=2)
    lsn = 0
    published = []  # python-side event log of everything main saw
    tags: dict[str, dict] = {}  # tag name -> expected pinned state
    n_tag = 0

    def merge_next(target, key, delete=False):
        nonlocal lsn
        lsn += 1
        ev = (lsn, key, "D" if delete else "U", None if delete else [lsn])
        rows = [(key, None if delete else [lsn],
                 None if delete else 1, None if delete else "s",
                 "D" if delete else "U", lsn)]
        merge_into(spark, target, _events(spark, rows),
                   fence_token=f"f:{lsn}", lsn_col="lsn")
        return ev

    for i, kind in enumerate(ops):
        key = KEYS[i % len(KEYS)]
        if kind == "merge":
            published.append(merge_next(t, key, delete=(i % 5 == 4)))
        elif kind == "tag":
            n_tag += 1
            name = f"rel{n_tag}"
            t.create_tag(name)
            tags[name] = _fold_state(published)
        elif kind == "droptag":
            if tags:
                name = sorted(tags)[0]
                t.drop_tag(name)
                del tags[name]
        elif kind == "branch_cycle":
            br = t.create_branch(f"b{i}")
            ev = merge_next(br, key)
            t.publish_branch(f"b{i}")
            t.drop_branch(f"b{i}")
            published.append(ev)
        elif kind == "branch_abandon":
            br = t.create_branch(f"x{i}")
            merge_next(br, key)  # staged but NEVER published
            t.drop_branch(f"x{i}")
        elif kind == "expire":
            t.expire_snapshots(keep_last=1, orphan_grace_seconds=0.0)
        # invariant after every op: main == fold of published events
        assert _read_state(spark, t) == _fold_state(published), (
            f"main diverged after op {i} ({kind})"
        )
        # every live tag still reads its pinned state
        for name, want in tags.items():
            assert _read_state(spark, t, tag=name) == want, (
                f"tag {name} diverged after op {i} ({kind})"
            )

    # terminal expiry + re-check everything once more
    t.expire_snapshots(keep_last=1, orphan_grace_seconds=0.0)
    assert _read_state(spark, t) == _fold_state(published)
    for name, want in tags.items():
        assert _read_state(spark, t, tag=name) == want
