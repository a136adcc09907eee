"""Curation operators: deterministic hash split, per-source token capping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concepts_pipeline_spark.operators.curation import (
    cap_tokens_per_source,
    hash_split,
    split_thresholds,
)


def test_split_assignment_is_stable_and_partition_invariant(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(13), "doc_id").collect()
    }
    assert a == b
    # growth-stability: the first 1000 keys keep their assignment when the
    # corpus doubles (split is a function of the key alone)
    half = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            spark.range(1000).select(F.col("id").alias("doc_id")), "doc_id"
        ).collect()
    }
    assert all(a[k] == v for k, v in half.items())
    # proportions roughly honored
    from collections import Counter

    c = Counter(a.values())
    assert c["train"] > 1900 and 0 < c["val"] < 60 and 0 < c["test"] < 60


def test_split_salt_rerolls(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(df, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, salt="s2").collect()}
    assert a != b


def test_split_thresholds_validate():
    with pytest.raises(ValueError):
        split_thresholds({"train": 0.5, "val": 0.1})


def test_cap_matches_naive_window_spec(spark):
    """The bucketed two-phase implementation must equal the declarative
    one-window-per-source spec exactly."""
    docs = (
        spark.range(3000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
            (F.pmod(F.col("id") * 37 + 11, F.lit(90)) + 10).alias("n_tok"),
        )
    )
    budget = 5000
    got = {
        r["doc_id"]
        for r in cap_tokens_per_source(
            docs, "source", "n_tok", "doc_id", budget=budget
        ).collect()
    }

    from pyspark.sql.window import Window

    hx = F.md5(F.concat(F.lit("cap-v1"), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("source")
        .orderBy(hx, "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["doc_id"]
        for r in docs.withColumn("cum", F.sum("n_tok").over(w))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    assert got == want
    # every source's kept token total is within budget
    kept = cap_tokens_per_source(docs, "source", "n_tok", "doc_id", budget=budget)
    sums = kept.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    assert all(r["t"] <= budget for r in sums)


def test_cap_budget_larger_than_source_keeps_everything(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("only").alias("source"),
        F.lit(5).alias("n_tok"),
    )
    kept = cap_tokens_per_source(docs, "source", "n_tok", "doc_id", budget=10_000)
    assert kept.count() == 100


def test_mix_sources_budgets_and_exclusion(spark):
    from concepts_pipeline_spark.operators.curation import mix_sources

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = {"src0": 0.6, "src1": 0.2}
    kept = mix_sources(docs, weights, 1000, token_col="n_chars")
    rows = kept.groupBy("source").agg(
        F.sum("n_chars").alias("toks")
    ).collect()
    got = {r["source"]: r["toks"] for r in rows}
    # both weighted sources MUST contribute (the corpus has plenty of both);
    # unlisted sources are excluded
    assert set(got) == {"src0", "src1"}
    assert 0 < got["src0"] <= 600
    assert 0 < got["src1"] <= 200
    # deterministic: same inputs, same mixture
    again = mix_sources(docs, weights, 1000, token_col="n_chars")
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in again.select("doc_id").collect())

    import pytest

    with pytest.raises(ValueError, match="negative"):
        mix_sources(docs, {"src0": -0.1}, 100)


def test_cap_thousand_sources_matches_naive_spec(spark):
    """The boundary computation is fully distributed (a window over the cell
    summary, never a driver collect): at 1,000 sources with per-source dict
    budgets the output must still equal the naive one-window-per-source spec."""
    n_src = 1000
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_src).cast("string")).alias("source"),
        (F.pmod(F.col("id") * 13 + 7, F.lit(50)) + 1).alias("n_tok"),
    )
    budgets = {f"s{i}": 200 + (i % 5) * 100 for i in range(n_src)}
    got = {
        r["doc_id"]
        for r in cap_tokens_per_source(
            docs, "source", "n_tok", "doc_id", budget=budgets
        ).collect()
    }

    from pyspark.sql.window import Window

    hx = F.md5(F.concat(F.lit("cap-v1"), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("source")
        .orderBy(hx, "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bmap = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    want = {
        r["doc_id"]
        for r in docs.withColumn("cum", F.sum("n_tok").over(w))
        .filter(F.col("cum") <= bmap[F.col("source")])
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_cap_dict_budget_drops_unlisted_source_even_zero_token_docs(spark):
    """A source absent from a dict budget is dropped ENTIRELY — including its
    zero-token docs, which budget-0 cum<=0 semantics would otherwise keep
    (the engine/oracle gate contract: WHERE source IN (budget keys))."""
    docs = spark.createDataFrame(
        [("a", "listed", 5), ("b", "unlisted", 0), ("c", "unlisted", 3)],
        "doc_id string, source string, n_tok int",
    )
    kept = cap_tokens_per_source(
        docs, "source", "n_tok", "doc_id", budget={"listed": 100}
    )
    assert {r["doc_id"] for r in kept.collect()} == {"a"}
    # an EXPLICIT zero budget keeps cum<=0 semantics: zero-token docs survive
    kept0 = cap_tokens_per_source(
        docs, "source", "n_tok", "doc_id",
        budget={"listed": 100, "unlisted": 0},
    )
    assert {r["doc_id"] for r in kept0.collect()} == {"a", "b"}


def test_shuffle_epoch_is_deterministic_permutation(spark):
    from concepts_pipeline_spark.operators.curation import shuffle_epoch

    docs = spark.createDataFrame(
        [(f"d{i:03d}", i % 3) for i in range(97)], "doc_id string, x int"
    )
    a = {r["doc_id"]: r["position"]
         for r in shuffle_epoch(docs, seed=1, num_partitions=7).collect()}
    b = {r["doc_id"]: r["position"]
         for r in shuffle_epoch(docs, seed=1, num_partitions=3).collect()}
    c = {r["doc_id"]: r["position"]
         for r in shuffle_epoch(docs, seed=2, num_partitions=7).collect()}
    # a permutation of 0..n-1
    assert sorted(a.values()) == list(range(97))
    # identical across topology (partition count must not matter)
    assert a == b
    # a different epoch seed is a different permutation
    assert a != c
    assert sorted(c.values()) == list(range(97))
    # payload columns ride along untouched
    row = shuffle_epoch(docs, seed=1).filter("doc_id = 'd005'").first()
    assert row["x"] == 5 % 3


def test_weighted_sample_deterministic_and_weight_monotone(spark):
    from concepts_pipeline_spark.operators.curation import weighted_sample

    docs = spark.createDataFrame(
        [(f"d{i:04d}", (i % 10) / 10.0) for i in range(2000)],
        "doc_id string, w double",
    )
    a = {r["doc_id"] for r in weighted_sample(docs, F.col("w")).collect()}
    b = {r["doc_id"] for r in
         weighted_sample(docs.repartition(13), F.col("w")).collect()}
    assert a == b  # partition-layout independent
    # weight 0 never kept; weight ~1 kept ~always; rate monotone in weight
    by_w = {}
    for r in docs.collect():
        by_w.setdefault(r["w"], []).append(r["doc_id"] in a)
    rates = {w: sum(v) / len(v) for w, v in by_w.items()}
    assert rates[0.0] == 0.0
    assert rates[0.9] > 0.75
    ws = sorted(rates)
    # empirical rate tracks the target within sampling noise (200/bucket)
    assert all(abs(rates[w] - w) < 0.12 for w in ws)
    # base_rate scales inclusion; clamp caps at 1
    c = {r["doc_id"] for r in
         weighted_sample(docs, F.col("w"), base_rate=10.0).collect()}
    assert len(c) / 2000 > 0.85
