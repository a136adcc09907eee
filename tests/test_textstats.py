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


def _py_fingerprint(text: str) -> int:
    """Independent Python reference for doc_fingerprint(hash_fn='md5')."""
    import hashlib
    import re

    p = 2147483647
    norm = re.sub(r"[^\w\s]", " ", text.lower()).strip()
    words = re.split(r"\s+", norm)  # NB: split('') == [''], matching Spark
    acc = 0
    for w in words:
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % p
        acc = (acc * 1000003 + h) % p
    return acc


def test_doc_fingerprint_md5_matches_python_reference(spark):
    from concepts_pipeline_spark.operators.textstats import doc_fingerprint

    rows = [
        (1, "Hello, World! The quick brown fox."),
        (2, "hello world the quick brown fox"),  # same words post-normalize as 1
        (3, "fox brown quick the world hello"),  # same words, different ORDER
        (4, ""),
        (5, "punctuation---only!!! ###"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["fingerprint"]
        for r in doc_fingerprint(df, "text", hash_fn="md5").collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_fingerprint(text), (doc_id, text)
    assert got[1] == got[2]     # normalization-invariant
    assert got[1] != got[3]     # order-sensitive (unlike a set hash)


def test_doc_fingerprint_rejects_unknown_hash(spark):
    import pytest

    from concepts_pipeline_spark.operators.textstats import doc_fingerprint

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        doc_fingerprint(df, "text", hash_fn="sha1")


def test_pii_scrub_counts_and_redacts(spark):
    from concepts_pipeline_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            ("a", "mail bob.smith+x@corp-mail.co.uk and jo@ex.io now"),
            ("b", "call 555-010-1234 or 555.010.9999 from 192.168.0.1"),
            ("c", "nothing here 12.34 and user at host dot com"),
            ("d", "edge 999.999.999.999 still matches the ipv4 SHAPE"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (got["a"]["n_email"], got["a"]["n_phone"], got["a"]["n_ipv4"]) == (2, 0, 0)
    assert got["a"]["redacted"] == "mail <PII> and <PII> now"
    assert (got["b"]["n_phone"], got["b"]["n_ipv4"]) == (2, 1)
    assert got["b"]["redacted"] == "call <PII> or <PII> from <PII>"
    assert (got["c"]["n_email"], got["c"]["n_phone"], got["c"]["n_ipv4"]) == (0, 0, 0)
    assert got["c"]["redacted"] == got["c"]["text"]
    # the shape-matcher is deliberately permissive (pattern, not validator)
    assert got["d"]["n_ipv4"] == 1


def test_unigram_logprob_orders_quality(spark):
    """Docs made of corpus-common words outscore docs of rare/gibberish words;
    counts and smoothing follow the add-one spec."""
    from concepts_pipeline_spark.operators.textstats import unigram_logprob

    docs = spark.createDataFrame(
        [("common", "the the the cat cat"),
         ("mixed", "the cat zqxv"),
         ("gibber", "zzqp qqxv wwvt")],
        "doc_id string, text string",
    )
    got = {r["key"]: r for r in unigram_logprob(docs).collect()}
    assert got["common"]["n_words"] == 5
    assert got["common"]["logprob"] > got["mixed"]["logprob"] > got["gibber"]["logprob"]
    # hand-check one cell: corpus total=11 words, vocab=6; p(the)=(4+1)/17
    import math
    the = math.log10(5 / 17)
    cat = math.log10(4 / 17)  # cnt(cat)=3 → (3+1)/17
    want = round((3 * the + 2 * cat) / 5, 6)
    assert abs(got["common"]["logprob"] - want) < 1e-6
