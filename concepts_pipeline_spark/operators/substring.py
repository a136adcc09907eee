"""Exact-substring duplicate-span detection over token arrays.

The missing dedup modality next to MinHash/SimHash/exact-hash (operators/
dedup.py): *substring-level* duplication a whole-document fingerprint cannot
see — boilerplate headers, license blocks, quoted passages — the signal the
suffix-array dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better") extracts. A distributed suffix array is not a Spark
shape; the standard scalable equivalent is **rolling k-token window hashing**:
every k-token window of every document is hashed, a window hash seen >= 2
times anywhere in the corpus marks its k tokens as duplicated, and per
document the overlapping duplicated windows merge (gaps-and-islands) into
maximal duplicated spans. Every substring duplication of length >= k is
caught exactly (all of its k-windows repeat); nothing shorter can be.

Reference analogue: the reference dedups whole records by key only
(ConceptsAggregator.scala:110-118); this extends the family to intra-document
spans for training-corpus curation.

Scale shape (the 100 TB story):
- window generation is MAP-ONLY (`transform(sequence(...))` + explode) — no
  shuffle, output rows = total tokens, never materialized wider than
  (key, pos, 16-byte hash);
- duplicated hashes come from ONE hash-partitioned groupBy with map-side
  partial aggregation; `count(*) >= min_count` needs no distinct expansion;
- marking is a semi-join of windows against the (small: true-duplicate-rate
  bounded) duplicated-hash set — an equi-join AQE can broadcast;
- span merging is a per-document window function: state bounded by one
  document's window count, partitioned on the document key, so no global
  sort and no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: ASCII unit separator (as a SQL expression -- no literal control byte in
#: source) joins tokens unambiguously before hashing: tokens produced by
#: text tokenizers never contain control bytes, so ["ab","c"] and ["a","bc"]
#: hash differently.
_SEP_SQL = "char(31)"


def token_window_hashes(
    df: DataFrame, tokens_col: str, key_col: str, k: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """(key, pos, win_hash) for every k-token window of every document.

    Map-only: windows are generated with `transform(sequence(0, n-k))`.
    ``hash_fn='md5'`` (default) hashes the unit-separator join of the
    window's tokens cast to string — byte-replayable in a SQL oracle.
    ``hash_fn='xxhash64'`` hashes the sliced array DIRECTLY (native array
    support, no string materialization) — the fast path for recurring /
    incremental maintenance, ~an order of magnitude less CPU per window;
    downstream results are identical modulo 64-bit collisions (the same
    fast-vs-portable trade as operators/dedup.py's minhash/simhash modes).
    Documents shorter than k contribute nothing.
    """
    t = tokens_col
    if hash_fn == "md5":
        h = (
            f"md5(array_join("
            f"transform(slice({t}, i + 1, {k}), x -> cast(x AS string)),"
            f" {_SEP_SQL}))"
        )
    elif hash_fn == "xxhash64":
        h = f"xxhash64(slice({t}, i + 1, {k}))"
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    win = F.expr(
        f"transform(sequence(0, size({t}) - {k}), i -> "
        f"struct(i AS pos, {h} AS win_hash))"
    )
    return (
        df.filter(F.size(F.col(t)) >= k)
        .select(F.col(key_col), F.explode(win).alias("w"))
        .select(
            key_col,
            F.col("w.pos").cast("long").alias("pos"),
            F.col("w.win_hash").alias("win_hash"),
        )
    )


def duplicate_substring_spans(
    df: DataFrame,
    tokens_col: str,
    key_col: str,
    k: int = 8,
    min_count: int = 2,
    dup_hashes: DataFrame | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A window hash occurring >= min_count times across the corpus (including
    repeats inside one document — self-plagiarized boilerplate is duplication
    too, matching the suffix-array semantics) marks its k tokens duplicated.
    Per document, duplicated windows whose starts are within k of each other
    overlap or touch and merge into one span.

    ``dup_hashes`` (a DataFrame with a ``win_hash`` column) supplies the
    duplicated-hash set from elsewhere — e.g. the incrementally-maintained
    ``lake/dupindex.DupHashIndex`` — replacing the corpus-wide groupBy with a
    point lookup against maintained state; ``df`` may then be any SUBSET of
    the corpus (the changed docs of a commit) and spans still reflect
    corpus-wide duplication.

    Output: (key, span_start, span_end, span_len, n_windows) with token
    positions 0-based inclusive. Deterministic for a given input.
    """
    wins = token_window_hashes(df, tokens_col, key_col, k=k, hash_fn=hash_fn)
    if dup_hashes is None:
        dup = (
            wins.groupBy("win_hash")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") >= min_count)
            .select("win_hash")
        )
    else:
        dup = dup_hashes.select("win_hash")
    marked = wins.join(dup, "win_hash", "left_semi")

    w = Window.partitionBy(key_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    brk = F.when(gap > k, F.lit(1)).otherwise(F.lit(0))
    islands = marked.select(
        key_col,
        "pos",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("island"),
    )
    return (
        islands.groupBy(key_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k)).cast("long").alias(
                "span_len"
            ),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("island")
    )


def scrub_duplicate_spans(
    df: DataFrame,
    tokens_col: str,
    key_col: str,
    k: int = 8,
    min_count: int = 2,
    dup_hashes: DataFrame | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Cut every duplicated span out of the token stream (the dedup ACTION).

    The curation counterpart of PII scrubbing: tokens inside any maximal
    duplicated span are removed; everything else keeps its relative order.
    Documents with no duplicated span pass through untouched (left join +
    coalesce), so output cardinality equals input cardinality.

    Scale shape: spans per document aggregate to ONE array row (bounded by
    n_tok / k), the docs⋈spans join is an equi-join on the document key, and
    the cut itself is an index-aware higher-order `filter` — map-side, no
    per-token shuffle, no Python.

    Output: (key, tokens_clean, n_tok_clean) with tokens_clean the filtered
    array in original order.
    """
    spans = duplicate_substring_spans(
        df, tokens_col, key_col, k=k, min_count=min_count,
        dup_hashes=dup_hashes, hash_fn=hash_fn,
    )
    span_lists = spans.groupBy(key_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = df.join(span_lists, key_col, "left")
    # filter's lambda index i is 0-based, matching span positions
    clean = F.when(F.col("_spans").isNull(), F.col(tokens_col)).otherwise(
        F.filter(
            F.col(tokens_col),
            lambda x, i: ~F.exists(
                F.col("_spans"),
                lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
            ),
        )
    )
    return joined.select(
        key_col,
        clean.alias("tokens_clean"),
        F.size(clean).cast("long").alias("n_tok_clean"),
    )


def duplicate_span_stats(
    df: DataFrame,
    tokens_col: str,
    key_col: str,
    k: int = 8,
    min_count: int = 2,
    dup_hashes: DataFrame | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document duplication profile from the maximal spans.

    (key, n_tok, dup_tokens, dup_frac, n_spans): dup_tokens sums the maximal
    spans (they are disjoint by construction, so no double counting),
    dup_frac = dup_tokens / n_tok. Documents with no duplicated span appear
    with zeros — this is the curation filter input (drop docs whose
    dup_frac exceeds a threshold), so total coverage matters.
    """
    spans = duplicate_substring_spans(
        df, tokens_col, key_col, k=k, min_count=min_count,
        dup_hashes=dup_hashes, hash_fn=hash_fn,
    )
    per_doc = spans.groupBy(key_col).agg(
        F.sum("span_len").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    base = df.select(
        key_col, F.size(F.col(tokens_col)).cast("long").alias("n_tok")
    )
    return (
        base.join(per_doc, key_col, "left")
        .select(
            key_col,
            "n_tok",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias(
                "n_spans"
            ),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_tokens") / F.col("n_tok"), 6).cast("double"),
        )
    )
