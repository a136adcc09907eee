"""Exact-substring duplicate-span detection (operators/substring.py).

Pins the rolling-window semantics: a shared run of >= k tokens between two
docs is found with exact boundaries; internal (self) repeats count; runs
shorter than k are invisible; overlapping/adjacent duplicated windows merge
into one maximal span; int token arrays hash identically to their string
casts; the plan is join/agg shaped (no cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concepts_pipeline_spark.operators.substring import (
    duplicate_span_stats,
    duplicate_substring_spans,
    token_window_hashes,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, toks array<string>")


def _spans(df, k=4):
    out = duplicate_substring_spans(df, "toks", "doc_id", k=k)
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_windows)
        for r in out.collect()
    }


def test_shared_run_exact_boundaries(spark):
    shared = [f"s{i}" for i in range(6)]
    df = _mk(
        spark,
        [
            ("a", ["x0", "x1"] + shared + ["x2"]),
            ("b", shared + ["y0", "y1", "y2"]),
        ],
    )
    # k=4: every 4-window inside the shared 6-run repeats; span = the run
    assert _spans(df, k=4) == {
        ("a", 2, 7, 6, 3),
        ("b", 0, 5, 6, 3),
    }


def test_run_shorter_than_k_invisible(spark):
    shared = ["s0", "s1", "s2"]
    df = _mk(
        spark,
        [("a", ["x"] + shared + ["y"]), ("b", shared + ["z", "w"])],
    )
    assert _spans(df, k=4) == set()


def test_internal_repeat_counts(spark):
    # one doc, phrase repeated twice with a unique gap — both occurrences
    # are duplicated spans (suffix-array semantics: self-repeats count)
    phrase = ["p0", "p1", "p2", "p3"]
    df = _mk(spark, [("a", phrase + ["g0", "g1", "g2"] + phrase)])
    assert _spans(df, k=4) == {
        ("a", 0, 3, 4, 1),
        ("a", 7, 10, 4, 1),
    }


def test_adjacent_islands_merge_and_split(spark):
    # doc c carries two shared runs separated by a gap > k: two spans
    r1 = [f"m{i}" for i in range(4)]
    r2 = [f"n{i}" for i in range(4)]
    gap = [f"u{i}" for i in range(6)]
    df = _mk(
        spark,
        [("c", r1 + gap + r2), ("d", r1 + ["q0"] * 5 + r2)],
    )
    got = {t for t in _spans(df, k=4) if t[0] == "c"}
    assert got == {("c", 0, 3, 4, 1), ("c", 10, 13, 4, 1)}


def test_periodic_doc_single_full_span(spark):
    df = _mk(spark, [("r", [f"t{i % 3}" for i in range(12)])])
    assert _spans(df, k=4) == {("r", 0, 11, 12, 9)}


def test_int_tokens_match_string_tokens(spark):
    ints = spark.createDataFrame(
        [("a", [1, 2, 3, 4, 5]), ("b", [9, 1, 2, 3, 4])],
        "doc_id string, toks array<int>",
    )
    strs = _mk(
        spark,
        [("a", ["1", "2", "3", "4", "5"]), ("b", ["9", "1", "2", "3", "4"])],
    )
    hi = {
        (r.doc_id, r.pos, r.win_hash)
        for r in token_window_hashes(ints, "toks", "doc_id", k=4).collect()
    }
    hs = {
        (r.doc_id, r.pos, r.win_hash)
        for r in token_window_hashes(strs, "toks", "doc_id", k=4).collect()
    }
    assert hi == hs and len(hi) == 4


def test_separator_disambiguates_token_splits(spark):
    # ["ab","c"] vs ["a","bc"] repeated k times must NOT collide
    df = _mk(spark, [("a", ["ab", "c"] * 2), ("b", ["a", "bc"] * 2)])
    assert _spans(df, k=4) == set()


def test_span_stats_cover_all_docs(spark):
    shared = [f"s{i}" for i in range(5)]
    df = _mk(
        spark,
        [
            ("a", shared + ["x0", "x1", "x2"]),
            ("b", ["y0"] + shared),
            ("clean", [f"z{i}" for i in range(10)]),
            ("tiny", ["t0", "t1"]),
        ],
    )
    stats = {
        r.doc_id: (r.n_tok, r.dup_tokens, r.n_spans, r.dup_frac)
        for r in duplicate_span_stats(df, "toks", "doc_id", k=4).collect()
    }
    assert stats["a"] == (8, 5, 1, 0.625)
    assert stats["b"] == (6, 5, 1, 0.833333)
    assert stats["clean"] == (10, 0, 0, 0.0)
    # docs shorter than k still appear, with zeros
    assert stats["tiny"] == (2, 0, 0, 0.0)


def test_scrub_cuts_spans_preserving_order(spark):
    from concepts_pipeline_spark.operators.substring import (
        scrub_duplicate_spans,
    )

    shared = [f"s{i}" for i in range(5)]
    df = _mk(
        spark,
        [
            ("a", ["x0", "x1"] + shared + ["x2"]),
            ("b", shared + ["y0"]),
            ("clean", [f"z{i}" for i in range(6)]),
        ],
    )
    out = {
        r.doc_id: (r.tokens_clean, r.n_tok_clean)
        for r in scrub_duplicate_spans(df, "toks", "doc_id", k=4).collect()
    }
    assert out["a"] == (["x0", "x1", "x2"], 3)
    assert out["b"] == (["y0"], 1)
    # untouched doc passes through whole — output cardinality == input
    assert out["clean"] == ([f"z{i}" for i in range(6)], 6)
    assert len(out) == 3


def test_scrub_fully_duplicated_doc_empties(spark):
    from concepts_pipeline_spark.operators.substring import (
        scrub_duplicate_spans,
    )

    shared = [f"s{i}" for i in range(4)]
    df = _mk(spark, [("a", shared), ("b", shared)])
    out = {
        r.doc_id: (r.tokens_clean, r.n_tok_clean)
        for r in scrub_duplicate_spans(df, "toks", "doc_id", k=4).collect()
    }
    assert out == {"a": ([], 0), "b": ([], 0)}


def test_plan_has_no_cartesian(spark):
    df = _mk(spark, [("a", [f"w{i}" for i in range(8)])])
    plan = duplicate_substring_spans(df, "toks", "doc_id", k=4)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_min_count_threshold(spark):
    shared = [f"s{i}" for i in range(4)]
    df = _mk(
        spark,
        [("a", shared), ("b", shared), ("c", shared)],
    )
    # min_count=4 > the 3 occurrences → nothing flagged
    got = duplicate_substring_spans(
        df, "toks", "doc_id", k=4, min_count=4
    ).count()
    assert got == 0
    got3 = duplicate_substring_spans(
        df, "toks", "doc_id", k=4, min_count=3
    ).count()
    assert got3 == 3


def test_cdc_dup_spans_composition(spark):
    """CDC × substring composition (__spark_entry__.q_cdc_dup_spans): the
    boilerplate-injecting UPDATE wins LWW for every 3rd doc (dup span covers
    at least the 12-token block), every 11th doc's DELETE wins (absent from
    the profile), and untouched docs survive with their original n_tok."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    base = {
        r.doc_id: r.n_tok
        for r in entry._bpe_docs(spark, sf).select("doc_id", "n_tok").collect()
    }
    rows = {r.doc_id: r for r in entry.q_cdc_dup_spans(spark, sf).collect()}

    deleted = {d for d in base if d % 11 == 0}
    assert deleted and not deleted & rows.keys()
    assert rows.keys() == base.keys() - deleted

    n_boiler = len(entry.CDC_BOILER)
    assert n_boiler >= entry.DUP_SPAN_K
    for d, r in rows.items():
        if d % 3 == 0:
            # update won: boilerplate prepended, its whole block duplicated
            assert r.n_tok == base[d] + n_boiler
            assert r.dup_tokens >= n_boiler and r.n_spans >= 1
        else:
            assert r.n_tok == base[d]
