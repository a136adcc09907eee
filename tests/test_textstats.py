"""repetition_features: Gopher-style repetition filters on crafted fixtures.

The oracle gate covers the full-table agreement with DuckDB; these pin the
hand-computable semantics (and the transform-lambda-arity pitfall: a
two-parameter lambda would silently receive the element INDEX as n)."""

from __future__ import annotations

from concepts_pipeline_spark.operators.textstats import repetition_features


def _by_id(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = repetition_features(df, "text", "doc_id")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_repetitive_vs_diverse(spark):
    got = _by_id(spark, [
        # "spam ham" * 4: words=[spam ham]*4 → 7 2-grams, "spam ham" occurs 4×
        (1, "spam ham spam ham spam ham spam ham"),
        # all-distinct words: every n-gram unique
        (2, "one two three four five six seven eight nine ten"),
    ])
    r = got[1]
    assert r["word_rep_ratio"] == 0.75            # 1 - 2/8
    assert r["top_2gram_frac"] == round(4 / 7, 6)
    assert r["dup_5gram_frac"] == 1.0             # every 5-gram repeats
    assert r["is_repetitive"] is True

    d = got[2]
    assert d["word_rep_ratio"] == 0.0
    assert d["top_2gram_frac"] == round(1 / 9, 6)  # 9 distinct 2-grams
    assert d["top_3gram_frac"] == 0.125            # 8 distinct 3-grams
    assert d["dup_5gram_frac"] == 0.0
    assert d["is_repetitive"] is False


def test_short_docs_coalesce_to_zero(spark):
    got = _by_id(spark, [(1, "word"), (2, "two words here")])
    assert got[1]["top_2gram_frac"] == 0.0
    assert got[1]["dup_5gram_frac"] == 0.0
    assert got[1]["is_repetitive"] is False
    # 3 words: two 2-grams, no 5-grams
    assert got[2]["top_2gram_frac"] == 0.5
    assert got[2]["dup_5gram_frac"] == 0.0
