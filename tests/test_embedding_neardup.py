"""Metric-blocked embedding near-dup: exactness vs brute force, and the tiled
verify stage's bounded Arrow-group memory on a skewed (single-cluster) fixture
where every vector lands in one IVF list."""

from __future__ import annotations

import pytest

from concepts_pipeline_spark.operators.dedup import (
    embedding_neardup_pairs,
    embedding_neardup_pairs_bruteforce,
)

DIM = 8
N = 240


@pytest.fixture(scope="module")
def skewed(spark):
    # one tight cluster: unit-ish base direction plus tiny deterministic jitter,
    # so ivf_assign puts (nearly) everything in a single list — the worst case
    # for per-group memory before tiling
    rows = []
    for i in range(N):
        v = [1.0 + 0.001 * ((i * 7 + d * 13) % 11) for d in range(DIM)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()
    yield df
    df.unpersist()


def pairset(df):
    return {
        (r["key_a"], r["key_b"], r["cosine"]) for r in df.collect()
    }


def test_tiled_output_equals_bruteforce_on_skew(spark, skewed):
    want = pairset(
        embedding_neardup_pairs_bruteforce(skewed, "embedding", "vec_id", 0.999999)
    )
    got = pairset(
        embedding_neardup_pairs(
            skewed, "embedding", "vec_id", 0.999999, num_lists=4, tile_size=16
        )
    )
    assert got == want
    assert len(got) > 0  # the fixture is a real cluster, not vacuous


def test_tile_bound_holds_on_mega_list(spark, skewed):
    # with tile_size=16 a verify group holds ≤ ~2 tiles of hash-bucketed rows;
    # 8× slack covers hash imbalance on 240 rows over 15 tiles. The assert runs
    # INSIDE the Arrow UDF — if tiling regressed to whole-list groups (240 rows)
    # this raises and fails the job.
    out = embedding_neardup_pairs(
        skewed,
        "embedding",
        "vec_id",
        0.999999,
        num_lists=4,
        tile_size=16,
        _assert_max_group_rows=16 * 8,
    )
    assert out.count() > 0


def test_tile_bound_assert_fires_without_tiling(spark, skewed):
    # sanity that the bound mechanism is live: one giant tile must violate a
    # small bound and surface the AssertionError through the job
    out = embedding_neardup_pairs(
        skewed,
        "embedding",
        "vec_id",
        0.999999,
        num_lists=4,
        tile_size=10**9,
        _assert_max_group_rows=32,
    )
    with pytest.raises(Exception, match="verify group holds"):
        out.count()


def test_tiled_output_equals_bruteforce_real_embeddings(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("vec_id", "cast(embedding as array<double>) embedding")
        .persist()
    )
    try:
        want = pairset(
            embedding_neardup_pairs_bruteforce(df, "embedding", "vec_id", 0.95)
        )
        got = pairset(
            embedding_neardup_pairs(
                df, "embedding", "vec_id", 0.95, num_lists=8, tile_size=32
            )
        )
        assert got == want
    finally:
        df.unpersist()
