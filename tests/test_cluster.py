"""Z-order clustering (lake/cluster.cluster_by): a logical no-op rewrite
(state byte-identical across CoW, MoR, and append tables) whose payoff is
multi-dimensional file skipping — after clustering, an AND-of-ranges probe
must prune most files via files_where_all, which single-column stats alone
cannot do. Also pins the maintenance contract: derived surfaces must treat a
cluster commit exactly like compaction (empty delta; replica walk skips it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc.generator import generate_change_log
from concepts_pipeline_spark.lake.cluster import cluster_by
from concepts_pipeline_spark.lake.merge import HIDDEN_DELETED
from concepts_pipeline_spark.lake.table import LakeTable
from tests.test_mor import SCHEMA, make_pipe, replay, state

LOG = ("doc_id string, lsn long, op string, tokens array<int>, "
       "n_tok int, source string")


def _grid_table(spark, tmp_path, name, rows=4096, buckets=4):
    """Uniform 2-D grid over (x, y) — the adversarial case for single-column
    stats: every bucket file spans the full range of both dims."""
    df = spark.range(rows).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 64).cast("int").alias("x"),
        ((F.col("id") / 64).cast("int") % 64).cast("int").alias("y"),
        F.when(F.col("id") % 3 == 0, F.lit("alpha"))
        .when(F.col("id") % 3 == 1, F.lit("beta"))
        .otherwise(F.lit("gamma"))
        .alias("s"),
    )
    t = LakeTable.create(
        str(tmp_path / name), df.schema, ["k"], num_buckets=buckets
    )
    t.overwrite(df)
    return t, df


def test_cluster_preserves_state_cow_and_prunes_multidim(spark, tmp_path):
    t, df = _grid_table(spark, tmp_path, "g")
    before = {tuple(r) for r in df.collect()}
    m0 = t.manifest()
    # pre-cluster: no stats at all -> nothing prunable
    assert len(t.files_where_all(m0, [("x", 8, 15), ("y", 8, 15)])) == len(m0.files)

    r = cluster_by(spark, t, ["x", "y"], bits=5, files_per_bucket=8)
    m1 = t.manifest()
    assert m1.summary["operation"] == "cluster"
    assert (m1.properties or {}).get("clustered_by") == ["x", "y"]
    assert set((m1.properties or {}).get("stat_cols")) >= {"x", "y"}
    assert r["files"] == len(m1.files) > len(m0.files)

    after = {tuple(r_) for r_ in t.read(spark).collect()}
    assert after == before  # logical no-op

    # an 1/64-area rectangle probe must skip most files, and the pruned
    # read must equal the exact filter
    kept = t.files_where_all(m1, [("x", 8, 15), ("y", 8, 15)])
    assert 0 < len(kept) <= len(m1.files) // 2, (len(kept), len(m1.files))
    got = {
        tuple(r_)
        for r_ in t.read_where_all(
            spark, [("x", 8, 15), ("y", 8, 15)]
        ).collect()
    }
    want = {r_ for r_ in before if 8 <= r_[1] <= 15 and 8 <= r_[2] <= 15}
    assert got == want and got


def test_cluster_string_dimension_prunes(spark, tmp_path):
    t, df = _grid_table(spark, tmp_path, "s")
    cluster_by(spark, t, ["s", "x"], bits=4, files_per_bucket=6)
    m = t.manifest()
    kept = t.files_where_all(m, [("s", "beta", "beta"), ("x", 0, 7)])
    assert 0 < len(kept) < len(m.files)
    got = {tuple(r) for r in t.read_where_all(
        spark, [("s", "beta", "beta"), ("x", 0, 7)]).collect()}
    want = {tuple(r) for r in df.collect() if r[3] == "beta" and r[1] <= 7}
    assert got == want and got


def test_cluster_mor_folds_deltas_and_keeps_tombstones_dead(spark, tmp_path):
    pipe = make_pipe(spark, tmp_path, "mor", "m")
    log = generate_change_log(spark, 2000, 150, num_batches=4)
    replay(spark, pipe, log)
    before = state(pipe.final_state())
    assert any(f.kind == "delta" for f in pipe.target.manifest().files)

    cluster_by(spark, pipe.target, ["n_tok", "source"], bits=4)
    m = pipe.target.manifest()
    assert all(f.kind == "base" for f in m.files)  # deltas folded, like compact
    assert state(pipe.final_state()) == before

    # tombstones survive the rewrite: a stale redelivery of a deleted key
    # must still lose to the retained tombstone LSN
    dead = pipe.target.read(spark).filter(
        F.coalesce(F.col(HIDDEN_DELETED), F.lit(False))
    )
    assert dead.count() > 0, "fixture needs at least one tombstone"
    victim, dead_lsn = dead.select("doc_id", "_lsn").first()
    stale = spark.createDataFrame(
        [(victim, int(dead_lsn) - 1, "U", [1, 2], 2, "zombie")], LOG)
    res = pipe.apply_batch(stale, fence_token="stale-after-cluster")
    assert state(pipe.final_state()) == before
    assert victim not in state(pipe.final_state())


def test_cluster_append_table_preserves_multiset(spark, tmp_path):
    """No hidden LSN -> no LWW: an append-only log keeps every duplicate row."""
    df = spark.createDataFrame(
        [("a", 1, "x")] * 3 + [("b", 2, "y")] * 2, "k string, v int, s string")
    t = LakeTable.create(str(tmp_path / "a"), df.schema, ["k"], num_buckets=2)
    t.append(df)
    t.append(df.limit(2))
    before = sorted(tuple(r) for r in t.read(spark).collect())
    cluster_by(spark, t, ["v"], bits=3)
    assert sorted(tuple(r) for r in t.read(spark).collect()) == before


def test_cluster_layout_maintained_across_rewrites(spark, tmp_path):
    """cluster_by persists its boundary grid (cluster_bounds); every later
    write z-sorts rewritten buckets with it, so parquet row-group stats stay
    tight on the clustered dims between explicit re-clusterings. The rewritten
    file's rows must come back z-nondecreasing; state stays the oracle's."""
    import os

    from concepts_pipeline_spark.lake.cluster import _cell_expr, _z_expr
    from concepts_pipeline_spark.lake.merge import merge_into

    t, df = _grid_table(spark, tmp_path, "g", rows=1024, buckets=2)
    cluster_by(spark, t, ["x", "y"], bits=4, files_per_bucket=2)
    m = t.manifest()
    bounds = m.properties["cluster_bounds"]
    assert set(bounds) == {"x", "y"} and m.properties["cluster_bits"] == 4

    # CoW merge rewrites the touched buckets; the rewrite must stay z-sorted
    src = spark.createDataFrame(
        [(f"k{i}", int(i % 64), int((i // 64) % 64), "delta", "U")
         for i in range(0, 1024, 7)],
        "k string, x int, y int, s string, op string",
    )
    merge_into(spark, t, src, fence_token="w1")
    m2 = t.manifest()
    new_files = [
        f for f in m2.files if f.path not in {x.path for x in m.files}
    ]
    assert new_files
    z = _z_expr([_cell_expr(c, bounds[c]) for c in ("x", "y")], 4)
    for f in new_files:
        rows = (
            spark.read.parquet(f"file://{os.path.join(t.path, f.path)}")
            .select(z.alias("z"))
            .collect()
        )
        zs = [r["z"] for r in rows]
        assert zs == sorted(zs), f"rewritten file {f.path} lost z order"

    # the maintained layout is a logical no-op: state equals the plain merge
    want = {(f"k{i}",) + ((int(i % 64), int((i // 64) % 64), "delta")
                          if i % 7 == 0 else
                          (int(i % 64), int((i // 64) % 64),
                           ["alpha", "beta", "gamma"][i % 3]))
            for i in range(1024)}
    got = {tuple(r) for r in t.read(spark).collect()}
    assert got == want


def test_cluster_on_branch_publishes_like_wap(spark, tmp_path):
    """Maintenance can be staged like data: cluster_by on a WAP branch leaves
    main untouched (and unprunable) until publish fast-forwards it to the
    clustered layout — layout changes get the same audit window as writes."""
    t, df = _grid_table(spark, tmp_path, "g", rows=512, buckets=2)
    before = {tuple(r) for r in t.read(spark).collect()}
    v0 = t.current_version()

    b = t.create_branch("maint")
    r = cluster_by(spark, b, ["x", "y"], bits=4, files_per_bucket=2)
    assert r["files"] > 0

    # main: untouched, no stats, nothing prunable
    m_main = t.manifest()
    assert t.current_version() == v0
    assert m_main.summary.get("operation") != "cluster"
    preds = [("x", 4, 11), ("y", 4, 11)]
    assert len(t.files_where_all(m_main, preds)) == len(m_main.files)
    # branch: clustered and prunable
    m_b = b.manifest()
    assert m_b.summary["operation"] == "cluster"
    kept = b.files_where_all(m_b, preds)
    assert 0 < len(kept) < len(m_b.files)

    t.publish_branch("maint")
    m2 = t.manifest()
    assert m2.summary["operation"] == "publish"  # fast-forward commit
    assert m2.properties["clustered_by"] == ["x", "y"]  # layout carried
    assert 0 < len(t.files_where_all(m2, preds)) < len(m2.files)
    assert {tuple(r) for r in t.read(spark).collect()} == before


def test_cluster_rejects_overflowing_bit_budget(spark, tmp_path):
    """bits x dims past a signed long would WRAP in the Java shift, not
    throw — the API must refuse up front."""
    import pytest

    t, _ = _grid_table(spark, tmp_path, "g", rows=64, buckets=2)
    with pytest.raises(ValueError, match="63"):
        cluster_by(spark, t, ["x", "y"], bits=32)


def test_cluster_grid_guard_after_dropping_a_clustered_dim(spark, tmp_path):
    """DDL that removes a clustered dimension leaves a stale boundary grid in
    the properties; the write path must skip the maintained z-sort (not crash
    on the missing column) and writes must keep working."""
    t, df = _grid_table(spark, tmp_path, "g", rows=256, buckets=2)
    cluster_by(spark, t, ["x", "y"], bits=3, files_per_bucket=2)
    t.drop_column("y")
    extra = spark.createDataFrame(
        [("z1", 5, "alpha"), ("z2", 6, "beta")], "k string, x int, s string"
    )
    t.append(extra)
    got = {r["k"] for r in t.read(spark).filter(F.col("x").isin(5, 6)).collect()}
    assert {"z1", "z2"} <= got


def test_cluster_is_maintenance_for_derived_surfaces(spark, tmp_path):
    """The replica's manifest walk must skip a cluster commit (its file churn
    flags every bucket, but the logical delta is empty), and an incremental
    view refresh spanning it must fold a zero delta."""
    from concepts_pipeline_spark.lake.replicate import Replica
    from concepts_pipeline_spark.lake.view import IncrementalAggView

    pipe = make_pipe(spark, tmp_path, "cow", "p")
    log = generate_change_log(spark, 1500, 120, num_batches=4)
    replay(spark, pipe, log, batches=2)

    view = IncrementalAggView(
        spark, pipe.target, str(tmp_path / "v"),
        group_cols=["source"], sum_cols={"tok_sum": "n_tok"},
    )
    view.full_refresh()
    rep = Replica(spark, pipe.target, str(tmp_path / "r"), num_buckets=2)
    rep.refresh()
    v_data = pipe.target.current_version()

    cluster_by(spark, pipe.target, ["n_tok"], bits=4)
    v_cluster = pipe.target.current_version()
    assert v_cluster == v_data + 1

    # replica walk: the cluster-only span derives ZERO touched buckets
    assert rep._touched_replica_buckets(v_data, v_cluster, 2) == []
    rep.refresh()
    assert state(rep.table.read(spark).filter(
        ~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)))) == state(
        pipe.final_state())

    view.refresh()
    want = {
        (r["source"], r["n_rows"], r["tok_sum"])
        for r in pipe.final_state().groupBy("source").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tok").alias("tok_sum")).collect()
    }
    got = {
        (r["source"], r["n_rows"], r["tok_sum"])
        for r in view.read().collect()
    }
    assert got == want
