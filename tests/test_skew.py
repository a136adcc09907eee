"""Extreme hot-key skew: 90% of events on ONE key must still reduce correctly
(and quickly — the map-side partial aggregation is what prevents the hot key's
raw events from concentrating on a single reducer)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc.apply import CdcPipeline
from concepts_pipeline_spark.operators.lww import lww_latest


def make_skewed(spark, n=200_000, hot_fraction=0.9):
    """Deterministic skewed feed: hot key gets hot_fraction of all events."""
    cut = int(n * hot_fraction)
    return spark.range(0, n, 1, 16).select(
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        F.when(F.col("id") < cut, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 500))
        .alias("doc_id"),
        F.array((F.col("id") % 97).cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )


def test_lww_under_extreme_skew(spark):
    df = make_skewed(spark)
    t0 = time.time()
    out = {r["doc_id"]: r["lsn"] for r in lww_latest(df, ["doc_id"]).collect()}
    elapsed = time.time() - t0
    assert out["HOT"] == 179_999  # max lsn among the hot key's 180k events
    assert len(out) == 501
    # every cold key's winner is its own max lsn
    assert out["k499"] == 199_999
    assert elapsed < 60


def test_replay_under_extreme_skew(spark, tmp_path):
    from __spark_entry__ import TOKENS_SCHEMA

    df = make_skewed(spark, n=50_000)
    pipe = CdcPipeline(
        spark, str(tmp_path / "t"), TOKENS_SCHEMA, ["doc_id"], num_buckets=4,
    )
    res = pipe.apply_batch(df, fence_token="skew:0")
    assert res.stats.applied == 501
    got = {r["doc_id"]: r["tokens"] for r in pipe.final_state().collect()}
    assert got["HOT"] == [(45_000 - 1) % 97]


def test_cap_tokens_under_single_source_domination(spark):
    """Adversarial curation shape: ONE source holds 99% of all docs/tokens.
    The two-phase bucketed boundary scan must (a) agree exactly with the
    naive `sum() OVER (PARTITION BY source ORDER BY hash)` window spec, and
    (b) confine its window to the boundary cell — the naive plan would
    serialize the hot source's 99k rows through one sorted task."""
    from pyspark.sql.window import Window

    from concepts_pipeline_spark.operators.curation import cap_tokens_per_source

    n = 100_000
    df = spark.range(0, n, 1, 16).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7 + 1).cast("int").alias("n_tok"),
        F.when(F.col("id") % 100 < 99, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), F.col("id") % 3))
        .alias("source"),
    )
    budget = 120_000  # keeps roughly a third of the hot source
    got = {
        r["doc_id"]
        for r in cap_tokens_per_source(
            df, budget=budget, salt="skew-t"
        ).select("doc_id").collect()
    }
    # declarative spec: one window over everything (fine at test scale).
    # Order by the FULL md5 then key — identical to the operator's order,
    # since the cell is the md5's 4-hex prefix (global md5 order == cell
    # order refined by within-cell md5 order).
    w = (
        Window.partitionBy("source")
        .orderBy(
            F.md5(F.concat(F.lit("skew-t"), F.col("doc_id"))), F.col("doc_id")
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["doc_id"]
        for r in df.withColumn("__cum", F.sum("n_tok").over(w))
        .filter(F.col("__cum") <= budget)
        .select("doc_id")
        .collect()
    }
    assert got == want and 0 < len(got) < n


def test_lsh_band_join_hot_bucket_cap_and_overflow_metric(spark):
    """Adversarial LSH shape: a template cluster of NEAR-dup (not identical)
    docs concentrates ~30% of the corpus into the same band buckets, which
    the exact-collapse cannot remove. The stop-bucket cap must (a) keep the
    candidate join under the capped bound, (b) be COUNTABLE beforehand via
    minhash_band_buckets (no silent truncation), and (c) leave disjoint
    small-cluster pairs untouched."""
    import pytest

    from concepts_pipeline_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{base} variant{i}") for i in range(300)]          # hot: near-dups
    rows += [(1000 + i, " ".join(f"c{i}w{k}" for k in range(6)))
             for i in range(50)]          # cold singletons: zero shared shingles
    rows += [(2000, "shared pair of docs alpha beta"),              # one true pair
             (2001, "shared pair of docs alpha beta gamma")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(n=1, num_hashes=32, bands=8, threshold=0.5)

    # the overflow metric sees the hot buckets BEFORE any cap decision
    sizes = minhash_band_buckets(df, "text", "doc_id", **{k: kw[k] for k in
                                                          ("n", "num_hashes", "bands")})
    hot = sizes.filter(F.col("size") > 64)
    assert hot.count() >= 1  # the template cluster concentrates at least one band

    # uncapped: the hot bucket's pair blowup trips a tight candidate bound
    with pytest.raises(AssertionError, match="candidate pairs > bound"):
        minhash_lsh_pairs(df, "text", "doc_id",
                          _assert_max_candidates=5_000, **kw).collect()

    # capped: bounded candidates, and the small disjoint pair is unaffected
    capped = minhash_lsh_pairs(df, "text", "doc_id", max_bucket_size=64,
                               _assert_max_candidates=5_000, **kw)
    pairs_set = {(r["key_a"], r["key_b"]) for r in capped.collect()}
    assert (2000, 2001) in pairs_set
    assert all(a < 1000 and b < 1000 for a, b in pairs_set
               if (a, b) != (2000, 2001))
