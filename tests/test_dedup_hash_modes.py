"""md5 hash modes for the MinHash-LSH and SimHash sketches.

The DuckDB oracle gate now replays both pipelines bit-for-bit in md5 mode;
these tests pin the mode-independent semantics (duplicates are always found,
both hash modes agree where recall is certain) plus a Python reference for the
md5-mode SimHash fingerprint itself.
"""

from __future__ import annotations

import hashlib

from concepts_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash,
    simhash_near_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),   # near dup (8/10 words)
    (4, "completely unrelated text about spark catalyst optimizer internals"),
]


def _pairs(df):
    return {(r["key_a"], r["key_b"]) for r in df.collect()}


def test_minhash_md5_finds_duplicates_and_agrees_with_xxhash(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {}
    for mode in ("md5", "xxhash64"):
        out = minhash_lsh_pairs(
            df, "text", "doc_id", n=1, num_hashes=32, bands=8,
            threshold=0.99, hash_fn=mode,
        )
        got[mode] = {(r["key_a"], r["key_b"]): r["jaccard"] for r in out.collect()}
        # identical shingle sets collide in EVERY band — recall is certain,
        # not probabilistic, so both modes must report exactly the dup pair
        assert got[mode] == {(1, 2): 1.0}, (mode, got[mode])


def test_simhash_md5_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    (row,) = simhash(df, "text", "doc_id", hash_fn="md5").collect()

    words = DOCS[0][1].split()
    sums = [0] * 64
    for w in words:
        hx = hashlib.md5(w.encode()).hexdigest()
        h60, h4 = int(hx[:15], 16), int(hx[15], 16)
        for b in range(64):
            bit = (h60 >> b) & 1 if b < 60 else (h4 >> (b - 60)) & 1
            sums[b] += 1 if bit == 1 else -1
    expect = 0
    for b in range(64):
        if sums[b] > 0:
            expect |= 1 << b
    if expect >= 1 << 63:  # two's-complement long, as Spark packs it
        expect -= 1 << 64
    assert row["simhash"] == expect


def test_simhash_near_pairs_md5_exact_dups_hamming_zero(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = simhash_near_pairs(df, "text", "doc_id", max_hamming=3, hash_fn="md5")
    rows = {(r["key_a"], r["key_b"]): r["hamming"] for r in out.collect()}
    assert rows.get((1, 2)) == 0          # identical docs: identical fingerprint
    assert (1, 4) not in rows and (2, 4) not in rows and (3, 4) not in rows
