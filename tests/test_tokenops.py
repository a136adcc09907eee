"""Token-stream operators: packing (offsets + materialized sequences),
decontamination, vocab stats."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from concepts_pipeline_spark.operators.tokenops import (
    global_running_offsets,
    ngram_decontaminate,
    pack_sequences,
    pack_token_stream,
    token_vocab_topk,
)


def _tok_table(spark, n_docs=97, seed=7):
    """Deterministic (doc_id, tokens, n_tok) with varied lengths incl. 0 and
    longer-than-seq_len docs."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        ln = rng.choice([0, 1, 3, 17, 40, 70, 130])
        toks = [(i * 1009 + j * 31) % 50257 for j in range(ln)]
        rows.append((f"d{i:04d}", toks, ln))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int"
    )


def test_global_running_offsets_match_serial_cumsum(spark):
    df = _tok_table(spark)
    out = global_running_offsets(
        df.filter("n_tok > 0"), "n_tok", "doc_id", num_partitions=7
    )
    got = {r["doc_id"]: (r["tok_start"], r["tok_end"]) for r in out.collect()}
    acc = 0
    for r in sorted(df.collect(), key=lambda r: r["doc_id"]):
        if r["n_tok"] == 0:
            assert r["doc_id"] not in got
            continue
        assert got[r["doc_id"]] == (acc, acc + r["n_tok"])
        acc += r["n_tok"]


def test_pack_sequences_offsets_and_spans(spark):
    df = _tok_table(spark)
    L = 64
    plan = {r["doc_id"]: r.asDict() for r in pack_sequences(
        df, seq_len=L, num_partitions=5
    ).collect()}
    acc = 0
    for r in sorted(df.collect(), key=lambda r: r["doc_id"]):
        if r["n_tok"] == 0:
            assert r["doc_id"] not in plan
            continue
        p = plan[r["doc_id"]]
        assert p["tok_start"] == acc
        assert p["seq_id"] == acc // L
        assert p["seq_offset"] == acc % L
        assert p["seqs_spanned"] == (acc + r["n_tok"] - 1) // L - acc // L + 1
        acc += r["n_tok"]


def test_pack_token_stream_reconstructs_concat(spark):
    df = _tok_table(spark)
    L = 64
    seqs = pack_token_stream(df, seq_len=L, num_partitions=5).collect()
    seqs.sort(key=lambda r: r["seq_id"])
    # contiguous sequence ids from 0
    assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))
    # all full-length except the final partial
    for r in seqs[:-1]:
        assert r["n_tok"] == L and len(r["tokens"]) == L
    assert 0 < seqs[-1]["n_tok"] <= L
    # flatten equals the serial concatenation in doc order
    flat = [t for r in seqs for t in r["tokens"]]
    expected = [
        t
        for r in sorted(df.collect(), key=lambda r: r["doc_id"])
        for t in r["tokens"]
    ]
    assert flat == expected


def test_pack_token_stream_partition_invariance(spark):
    df = _tok_table(spark, n_docs=41)
    a = {r["seq_id"]: r["tokens"] for r in pack_token_stream(
        df, seq_len=50, num_partitions=2
    ).collect()}
    b = {r["seq_id"]: r["tokens"] for r in pack_token_stream(
        df, seq_len=50, num_partitions=11
    ).collect()}
    assert a == b


def test_ngram_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [
            ("t1", "the quick brown fox jumps over the lazy dog"),
            ("t2", "completely unrelated sentence about spark plans"),
            ("t3", "quick brown fox again but different tail here"),
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [
            ("b1", "a quick brown fox appears in the benchmark"),
            ("b2", "the lazy dog sleeps all day"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in ngram_decontaminate(
        train, bench, n=3
    ).collect()}
    # t1 shares "quick brown fox" with b1 and "the lazy dog" with b2
    assert out["t1"]["contaminated"] is True
    assert out["t1"]["n_contaminated"] == 2
    assert out["t1"]["n_bench_docs"] == 2
    # t3 shares "quick brown fox" with b1 only
    assert out["t3"]["contaminated"] is True
    assert out["t3"]["n_contaminated"] == 1
    assert out["t3"]["n_bench_docs"] == 1
    # t2 shares nothing
    assert out["t2"]["contaminated"] is False
    assert out["t2"]["n_contaminated"] == 0
    assert out["t2"]["n_bench_docs"] == 0
    # denominator is the doc's distinct 3-gram count (9 words -> 7 shingles)
    assert out["t1"]["n_shingles"] == 7
    assert abs(out["t1"]["contamination_ratio"] - round(2 / 7, 6)) < 1e-9


def test_token_vocab_topk_counts_and_cut(spark):
    df = spark.createDataFrame(
        [
            ("d1", "aa bb aa cc"),
            ("d2", "aa bb dd"),
            ("d3", "aa!"),
        ],
        "doc_id string, text string",
    )
    rows = token_vocab_topk(df, k=3).collect()
    assert [(r["token"], r["n_occurrences"], r["n_docs"]) for r in rows] == [
        ("aa", 4, 3),
        ("bb", 2, 2),
        ("!", 1, 1),  # ties at count 1 cut by token asc: '!' < 'cc' < 'dd'
    ]


def test_remap_tokens_identity_default_drop_and_null_empty(spark):
    from concepts_pipeline_spark.operators.tokenops import remap_tokens

    df = spark.createDataFrame(
        [
            ("a", [1, 2, 3, 2], 4, "s"),
            ("b", [5], 1, "s"),
            ("c", [], 0, "s"),       # empty array stays empty, not NULL
            ("d", None, None, "s"),  # NULL array stays NULL
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    mapping = spark.createDataFrame(
        [(2, 200), (5, 500)], "old_id int, new_id int"
    )
    got = {
        r["doc_id"]: (r["tokens"], r["n_tok"])
        for r in remap_tokens(df, mapping).collect()
    }
    assert got == {
        "a": ([1, 200, 3, 200], 4),  # order + duplicates preserved
        "b": ([500], 1),
        "c": ([], 0),
        "d": (None, None),
    }
    # vocab truncation: unmapped ids drop, n_tok recomputed
    dropped = {
        r["doc_id"]: (r["tokens"], r["n_tok"])
        for r in remap_tokens(df, mapping, drop_unmapped=True).collect()
    }
    assert dropped == {
        "a": ([200, 200], 2),
        "b": ([500], 1),
        "c": ([], 0),
        "d": (None, None),
    }
