"""Exact-duplicate collapse before LSH/Jaccard candidate generation.

A boilerplate-heavy corpus guarantees mega-clusters of IDENTICAL text; every
band/shingle bucket containing such a cluster would emit O(cluster²) candidate
pairs. The operators collapse to one representative per md5(text) first, run
candidate generation over representatives only, and reconstruct the full
answer afterwards — these tests pin (a) output equality with the uncollapsed
path, (b) the candidate bound staying O(unique²) under a 10k-copy cluster,
and (c) the survivors path never materializing intra-cluster pairs at all.
"""

from __future__ import annotations

import pytest

from concepts_pipeline_spark.operators.dedup import (
    dedup_survivors,
    dedup_survivors_lsh,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

BASE = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",   # near dup of [0]
    "completely unrelated text about spark catalyst optimizer internals",
    "another distinct document mentioning shuffle partitions and skew",
]


def _corpus(spark, n_copies: int):
    """n_copies of BASE[0] (keys 0..n-1) + one each of BASE[1..] after."""
    rows = [(i, BASE[0]) for i in range(n_copies)] + [
        (n_copies + j, t) for j, t in enumerate(BASE[1:], 0)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairset(df):
    return {(r["key_a"], r["key_b"], r["jaccard"]) for r in df.collect()}


def test_lsh_collapse_output_equals_uncollapsed(spark):
    # moderate corpus with dup clusters of size 3 and 2 + near-dups + uniques
    rows = (
        [(i, BASE[0]) for i in (7, 2, 9)]
        + [(i, BASE[1]) for i in (4, 11)]
        + [(12, BASE[2]), (13, BASE[3])]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(n=1, num_hashes=32, bands=8, threshold=0.5)
    on = _pairset(minhash_lsh_pairs(df, "text", "doc_id", collapse_exact=True, **kw))
    off = _pairset(minhash_lsh_pairs(df, "text", "doc_id", collapse_exact=False, **kw))
    assert on == off and len(on) >= 10  # C(5,2) near/exact pairs across clusters


def test_jaccard_collapse_output_equals_uncollapsed(spark):
    rows = [(i, BASE[0]) for i in (1, 5, 3)] + [(6, BASE[1]), (8, BASE[2])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(n=1, threshold=0.5)
    on = _pairset(ngram_jaccard_pairs(df, "text", "doc_id", collapse_exact=True, **kw))
    off = _pairset(ngram_jaccard_pairs(df, "text", "doc_id", collapse_exact=False, **kw))
    assert on == off
    # intra-cluster pairs are exactly 1.0 via the reconstruction, not verify
    assert (1, 3, 1.0) in on and (1, 5, 1.0) in on and (3, 5, 1.0) in on


def test_survivors_lsh_10k_copy_cluster_candidates_stay_o_unique_squared(spark):
    """10k identical docs collapse to ONE representative: the band join over
    the 4 reps may emit at most C(4,2)=6 candidates. Without the collapse the
    same input would emit ~50M candidate pairs and trip the bound."""
    df = _corpus(spark, 10_000).repartition(8)
    # threshold 0.7 < 7/9: the near-dup doc (key 10_000) joins the cluster,
    # exercising the rep-level component fanning back through BOTH digests
    out = dedup_survivors_lsh(
        df, "text", "doc_id", n=1, threshold=0.7, _assert_max_candidates=6
    )
    rows = {r["doc_id"]: (r["cluster_rep"], r["is_survivor"]) for r in out.collect()}
    assert len(rows) == 10_003
    # the identical cluster + its near-dup fold into one component, rep = min key 0
    assert rows[0] == (0, True)
    assert all(rows[i] == (0, False) for i in (1, 777, 9_999, 10_000))
    # uniques survive as their own singleton clusters
    assert rows[10_001] == (10_001, True) and rows[10_002] == (10_002, True)
    assert sum(1 for _, s in rows.values() if s) == 3


def test_uncollapsed_band_join_trips_the_candidate_bound(spark):
    """Negative control: the same bound FAILS without the collapse — proves
    the assertion hook measures the band join, not the output."""
    df = _corpus(spark, 100)
    with pytest.raises(AssertionError, match="candidate pairs > bound"):
        minhash_lsh_pairs(
            df, "text", "doc_id", n=1, threshold=0.8,
            collapse_exact=False, _assert_max_candidates=6,
        ).collect()


def test_survivors_exact_path_matches_lsh_on_dup_heavy_corpus(spark):
    df = _corpus(spark, 50)
    a = {(r["doc_id"], r["cluster_rep"], r["is_survivor"])
         for r in dedup_survivors(df, "text", "doc_id", n=1, threshold=0.8).collect()}
    b = {(r["doc_id"], r["cluster_rep"], r["is_survivor"])
         for r in dedup_survivors_lsh(df, "text", "doc_id", n=1, threshold=0.8).collect()}
    assert a == b and len(a) == 53
