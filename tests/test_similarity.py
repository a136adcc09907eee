"""Similarity-search operator tests: exactness of brute-force top-k, and recall
of the two approximate paths (hyperplane LSH and IVF) against it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concepts_pipeline_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
)

QUERY = [round(0.015 * ((i * 37 + 11) % 64) - 0.45, 3) for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .persist()
    )
    yield df
    df.unpersist()


def ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_cosine_topk_matches_python_bruteforce(spark, emb):
    rows = emb.collect()
    qn = sum(x * x for x in QUERY) ** 0.5

    def cos(v):
        dot = sum(a * b for a, b in zip(v, QUERY))
        n = sum(a * a for a in v) ** 0.5
        return round(dot / (n * qn), 6)

    want = sorted(((cos(r["embedding"]), r["vec_id"]) for r in rows),
                  key=lambda t: (-t[0], t[1]))[:10]
    got = [(r["cosine"], r["vec_id"]) for r in cosine_topk(emb, QUERY, k=10).collect()]
    assert got == want


def test_ann_ivf_recall(spark, emb):
    exact = set(ids(cosine_topk(emb, QUERY, k=10)))
    approx = set(ids(ann_ivf_topk(emb, QUERY, k=10, num_lists=8, n_probe=4)))
    # probing half the lists must recover at least half the true neighbors
    assert len(exact & approx) >= 5


def test_ann_lsh_recall(spark, emb):
    exact = set(ids(cosine_topk(emb, QUERY, k=10)))
    # recall/pruning tradeoff is monotone in the hamming radius (measured on this
    # feed: r=6→4/10, r=7→5/10, r=8→7/10, r=9→9/10)
    approx = set(ids(ann_lsh_topk(emb, QUERY, k=10, planes=16, max_hamming=8)))
    assert len(exact & approx) >= 6


def test_hyperplane_components_are_spec_pinned():
    """blake2b-derived components are part of the signature spec: data-side and
    query-side signatures must agree across sessions and Python builds, so the
    first components are pinned exactly."""
    from concepts_pipeline_spark.operators.similarity import _hyperplane_component

    got = [
        round(_hyperplane_component(7, p, i), 12)
        for p in range(2)
        for i in range(4)
    ]
    assert got == [
        0.188468760156, -0.628852188501, -0.439853271805, -0.814387849955,
        0.781645620191, -0.683755745572, -0.103071259592, 0.826521730941,
    ]
