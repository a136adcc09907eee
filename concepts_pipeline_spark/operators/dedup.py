"""Deduplication operators for large-scale training-data pipelines.

The reference deduplicates exact keys in-stream (ConceptsAggregator.scala:110-118,
3.7M → <0.25M rows). A training-data pipeline needs the generalized family, all
expressed as shuffles Catalyst can plan (no driver-side state):

- exact_dedup        — hash-groupBy on content digest
- ngram_jaccard_pairs— exact n-gram Jaccard similarity pairs (small/verify path)
- minhash_signatures / minhash_lsh_pairs — MinHash + banded LSH (the 100 TB path:
  candidate generation is an equi-join on band buckets, never an O(n²) cross join)
- simhash            — 64-bit SimHash fingerprints + banded near-pair candidates
- embedding_neardup_pairs — cosine near-duplicates over an embedding column

Scale notes: every operator keys its shuffle on a content-derived value (digest,
band bucket), so hot keys are only as hot as true duplicates are frequent; band
tables are orders of magnitude smaller than a shingle inverted index at the same
recall; the exact verifiers run only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_words(col) -> F.Column:
    """Lowercased word array, punctuation stripped — shared normalizer."""
    return F.split(F.trim(F.lower(F.regexp_replace(col, r"[^\w\s]", " "))), r"\s+")


_MINHASH_P = 2147483647  # 2^31 - 1, the permutation-family modulus


def minhash_perm_constants(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) for the universal-hash family
    h_i(x) = (a_i * x + b_i) mod 2^31-1, derived from md5 so any engine can
    re-derive them (no Python hash(), no RNG state). a_i is odd and < 2^29,
    so a_i * x < 2^60 — no 63-bit overflow under ANSI mode."""
    import hashlib

    def _h7(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    a = [_h7(f"mh-a-{i}") * 2 + 1 for i in range(num_hashes)]
    b = [_h7(f"mh-b-{i}") for i in range(num_hashes)]
    return a, b


def _md5_word_hash60(col) -> F.Column:
    """First 60 bits of md5(col) as a non-negative long — the engine-portable
    base hash shared by the md5 modes here and textstats.doc_fingerprint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _minhash_min_exprs(num_hashes: int, hash_fn: str) -> list:
    """Per-permutation min-aggregate expressions over the 'shingle' column
    (md5 mode additionally expects the precomputed '__hb' base-hash column)."""
    if hash_fn == "xxhash64":
        return [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    if hash_fn == "md5":
        a, b = minhash_perm_constants(num_hashes)
        return [
            F.min(
                F.pmod(F.lit(a[i]) * F.col("__hb") + F.lit(b[i]), F.lit(_MINHASH_P))
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    raise ValueError("hash_fn must be 'xxhash64' or 'md5'")


def _exact_rep_map(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """(key, __digest, __rep) per row: md5 digest of the raw content and the
    minimum key holding that digest — the exact-duplicate collapse map shared
    by the near-dup operators.

    Why collapse first: a boilerplate-heavy corpus guarantees million-doc
    clusters of IDENTICAL text, and any shingle/band bucket containing such a
    cluster emits O(cluster²) candidate pairs. Identical docs are the only
    unbounded-cluster case a content-derived hash bucket can produce (near-dup
    clusters are bounded by the corpus's true near-dup rate), so running
    candidate generation over one representative per digest and expanding
    afterwards removes the blowup without changing a single output row:
    shingle sets are a pure function of the text, so jaccard(x, y) =
    jaccard(rep_x, rep_y) and intra-cluster pairs are exactly 1.0."""
    digest = F.coalesce(
        F.md5(F.col(text_col).cast("string")), F.lit("\x00null")
    ).alias("__digest")
    m = df.select(F.col(key_col).alias("key"), digest)
    reps = m.groupBy("__digest").agg(F.min("key").alias("__rep"))
    return m.join(reps, "__digest")


def _expand_rep_pairs(rep_pairs: DataFrame, rm: DataFrame, threshold: float) -> DataFrame:
    """Fan representative-level near-dup pairs back to the full doc-pair set:
    intra-cluster pairs (identical text, jaccard exactly 1.0) plus every
    member-level combination of each rep-level pair. The two sets are disjoint
    (intra shares a digest, cross spans two), so a plain union is exact."""
    members = rm.select("key", "__digest")
    intra = (
        members.alias("x")
        .join(members.alias("y"), "__digest")
        .filter(F.col("x.key") < F.col("y.key"))
        .select(
            F.col("x.key").alias("key_a"),
            F.col("y.key").alias("key_b"),
            F.lit(1.0).alias("jaccard"),
        )
        .filter(F.lit(1.0) >= F.lit(float(threshold)))
    )
    rep_of = rm.select("__rep", "key")
    cross = (
        rep_pairs.join(
            rep_of.select(F.col("__rep").alias("key_a"), F.col("key").alias("__ka")),
            "key_a",
        )
        .join(
            rep_of.select(F.col("__rep").alias("key_b"), F.col("key").alias("__kb")),
            "key_b",
        )
        .select(
            F.least("__ka", "__kb").alias("key_a"),
            F.greatest("__ka", "__kb").alias("key_b"),
            "jaccard",
        )
    )
    return intra.unionByName(cross)


def exact_dedup(df: DataFrame, content_col: str, key_col: str) -> DataFrame:
    """One representative row per identical content: the minimum key per md5 digest.

    Deterministic winner (min key), unlike dropDuplicates' arbitrary first row —
    required for oracle comparison and for idempotent re-runs.
    """
    digest = F.md5(F.col(content_col).cast("string")).alias("__digest")
    w = df.select(F.col(key_col), digest)
    winners = w.groupBy("__digest").agg(F.min(key_col).alias(key_col))
    return df.join(winners, on=key_col, how="inner")  # broadcast-able winner set


def word_ngrams(df: DataFrame, text_col: str, key_col: str, n: int = 3) -> DataFrame:
    """Explode distinct word n-gram shingles: (key, shingle)."""
    words = normalized_words(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    shingles = F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return df.select(F.col(key_col).alias("key"), F.explode(shingles).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = True,
) -> DataFrame:
    """Exact Jaccard-similar pairs over n-gram shingle sets.

    Inverted-index join on shared shingles (only docs sharing ≥1 shingle ever meet),
    then |A∩B| / (|A|+|B|-|A∩B|). Returns (key_a, key_b, jaccard) with key_a < key_b.
    At scale this is the *verify* stage — candidate generation should use LSH below.

    ``collapse_exact`` (default on): run the inverted-index join over one
    representative per identical text and expand afterwards — identical-text
    mega-clusters (boilerplate, empty docs) otherwise turn every shared
    shingle's posting into an O(cluster²) pair emitter. Output is unchanged
    (see _exact_rep_map).
    """
    if collapse_exact:
        rm = _exact_rep_map(df, text_col, key_col).localCheckpoint()
        reps = df.join(
            rm.filter(F.col("key") == F.col("__rep")).select(
                F.col("key").alias(key_col)
            ),
            key_col,
        )
        rep_pairs = ngram_jaccard_pairs(
            reps, text_col, key_col, n=n, threshold=threshold,
            collapse_exact=False,
        )
        return _expand_rep_pairs(rep_pairs, rm, threshold)
    sh = word_ngrams(df, text_col, key_col, n).persist()
    try:
        sizes = sh.groupBy("key").agg(F.count("*").alias("set_size"))
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, on="shingle")
            .filter(F.col("a.key") < F.col("b.key"))
            .groupBy(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
            .agg(F.count("*").alias("inter"))
        )
        out = (
            inter.join(sizes.withColumnRenamed("key", "key_a").withColumnRenamed("set_size", "size_a"), "key_a")
            .join(sizes.withColumnRenamed("key", "key_b").withColumnRenamed("set_size", "size_b"), "key_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("key_a", "key_b", "jaccard")
        )
        out = out.localCheckpoint()  # materialize before unpersisting the shingles
    finally:
        sh.unpersist()
    return out


def minhash_signatures(
    df: DataFrame, text_col: str, key_col: str, n: int = 3, num_hashes: int = 32,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per doc: min over shingles of the i-th permutation hash.

    One shuffle (groupBy key); the signature is an array<long> of length num_hashes.
    ``hash_fn='xxhash64'`` (default): h_i = xxhash64(i, shingle), the JVM fast
    path. ``hash_fn='md5'``: h_i = (a_i * md5_60(shingle) + b_i) mod 2^31-1 with
    md5-derived constants — slower, but bit-reproducible in any engine with md5,
    which puts the whole LSH pipeline behind the DuckDB oracle gate.
    """
    sh = word_ngrams(df, text_col, key_col, n)
    mins = _minhash_min_exprs(num_hashes, hash_fn)
    if hash_fn == "md5":
        sh = sh.withColumn("__hb", F.pmod(_md5_word_hash60(F.col("shingle")), F.lit(_MINHASH_P)))
    agg = sh.groupBy("key").agg(*mins)
    return agg.select(
        "key", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def _band_entries(sig: DataFrame, bands: int, rows: int, hash_fn: str) -> DataFrame:
    """(key, band, bucket) from a signature table — the LSH band table.
    md5 mode uses the hex-string bucket (identical expression in DuckDB)."""
    if hash_fn == "md5":
        bucket_of = lambda b: F.md5(  # noqa: E731
            F.concat_ws(",", F.slice("signature", b * rows + 1, rows))
        )
    else:
        bucket_of = lambda b: F.xxhash64(  # noqa: E731
            F.concat_ws(",", F.slice("signature", b * rows + 1, rows)), b
        )
    return sig.select(
        "key",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), bucket_of(b).alias("bucket")),
            )
        ).alias("bb"),
    ).select("key", "bb.band", "bb.bucket")


def minhash_band_buckets(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "xxhash64",
    collapse_exact: bool = True,
) -> DataFrame:
    """(band, bucket, size) distribution of the LSH band table — the ops/
    observability surface behind ``max_bucket_size``: run it with the same
    parameters as :func:`minhash_lsh_pairs` to see how hot the band buckets
    are and count exactly which buckets a cap would silence (the overflow
    metric — a capped run should always report what it dropped, never
    truncate silently)."""
    src = df
    if collapse_exact:
        rm = _exact_rep_map(df, text_col, key_col)
        src = df.join(
            rm.filter(F.col("key") == F.col("__rep")).select(
                F.col("key").alias(key_col)
            ),
            key_col,
        )
    sig = minhash_signatures(
        src, text_col, key_col, n=n, num_hashes=num_hashes, hash_fn=hash_fn
    )
    return (
        _band_entries(sig, bands, num_hashes // bands, hash_fn)
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("size"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    collapse_exact: bool = True,
    max_bucket_size: int | None = None,
    _assert_max_candidates: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact Jaccard.

    shingle → minhash → band buckets → equi-join on (band, bucket-hash) → exact
    verify. The band join is the only pairwise step and touches only colliding
    docs — this is the shape that survives 100 TB.

    ``collapse_exact`` (default on): identical docs share every band bucket,
    so a million-copy boilerplate cluster makes one bucket emit ~10^12
    candidate pairs. Candidate generation + verify run over one representative
    per identical text; the full pair set is reconstructed afterwards
    (identical-text pairs are exactly jaccard 1.0, cross-cluster pairs equal
    their reps' — signatures and shingle sets are pure functions of the text),
    so the output is bit-identical with the blowup removed. The band join's
    hot-key bound becomes the corpus's true NEAR-dup cluster size.

    ``hash_fn='md5'`` swaps both the permutation hashes and the band-bucket
    hash for md5-derived ones (see minhash_signatures) — every stage then has
    an exact DuckDB twin, so the gate checks the LSH pipeline itself, not just
    the verified-jaccard contract.

    ``max_bucket_size`` (off by default): drop band buckets holding more
    members than the cap from candidate generation — the stop-bucket guard
    for corpus-scale NEAR-dup template clusters, whose members still pair via
    their other (smaller) bands. Count what a cap silences with
    :func:`minhash_band_buckets` before turning it on.

    ``_assert_max_candidates`` (tests only): count the band join's candidate
    pairs and raise if the bound is exceeded — the O(unique²) regression guard.
    """
    if collapse_exact:
        rm = _exact_rep_map(df, text_col, key_col).localCheckpoint()
        reps = df.join(
            rm.filter(F.col("key") == F.col("__rep")).select(
                F.col("key").alias(key_col)
            ),
            key_col,
        )
        rep_pairs = minhash_lsh_pairs(
            reps, text_col, key_col, n=n, num_hashes=num_hashes, bands=bands,
            threshold=threshold, hash_fn=hash_fn, collapse_exact=False,
            max_bucket_size=max_bucket_size,
            _assert_max_candidates=_assert_max_candidates,
        )
        return _expand_rep_pairs(rep_pairs, rm, threshold)
    rows = num_hashes // bands
    sh = word_ngrams(df, text_col, key_col, n)
    # one shuffle produces BOTH the minhash signature and the exact shingle set —
    # the verify stage then never rebuilds the inverted index
    mins = _minhash_min_exprs(num_hashes, hash_fn)
    if hash_fn == "md5":
        sh = sh.withColumn(
            "__hb", F.pmod(_md5_word_hash60(F.col("shingle")), F.lit(_MINHASH_P))
        )
    # ONE materialization of the expensive explode+aggregate: per_key feeds the
    # signature/band branch AND both sides of the exact verify — without the
    # persist the shingle aggregation would recompute up to 3× (the same reason
    # ngram_jaccard_pairs persists its shingle table)
    per_key = sh.groupBy("key").agg(
        *mins, F.collect_set("shingle").alias("sh_set")
    ).localCheckpoint()
    sig = per_key.select(
        "key",
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )
    band_entries = _band_entries(sig, bands, rows, hash_fn)
    if max_bucket_size is not None:
        # stop-bucket guard for the Zipf head of NEAR-dup clusters (exact
        # duplicates were already collapsed): a band bucket holding B docs
        # emits B² candidates in one join key, so a corpus-scale template
        # cluster turns one reducer into the whole job. Buckets past the cap
        # generate no candidates from THAT band — members still pair via
        # their other bands (standard LSH stop-shingle practice; recall cost
        # is bounded and countable via minhash_band_buckets).
        sizes = band_entries.groupBy("band", "bucket").agg(
            F.count("*").alias("__bsz")
        )
        band_entries = (
            band_entries.join(
                sizes.filter(F.col("__bsz") <= int(max_bucket_size)),
                ["band", "bucket"],
            ).drop("__bsz")
        )
    cand = (
        band_entries.alias("x")
        .join(band_entries.alias("y"), on=["band", "bucket"])
        .filter(F.col("x.key") < F.col("y.key"))
        .select(F.col("x.key").alias("key_a"), F.col("y.key").alias("key_b"))
        .distinct()
    )
    if _assert_max_candidates is not None:
        cand = cand.localCheckpoint()
        n_cand = cand.count()
        if n_cand > _assert_max_candidates:
            raise AssertionError(
                f"band join emitted {n_cand} candidate pairs > bound "
                f"{_assert_max_candidates}"
            )
    # exact verify only on LSH candidates: two equi-joins bring each side's exact
    # shingle set, intersection is a per-row array op — cost is O(|candidates|),
    # never the inverted-index pair blowup
    sets = per_key.select(
        "key", F.col("sh_set"), F.size("sh_set").alias("set_size")
    )
    verified = (
        cand.join(
            sets.select(
                F.col("key").alias("key_a"),
                F.col("sh_set").alias("set_a"),
                F.col("set_size").alias("size_a"),
            ),
            "key_a",
        )
        .join(
            sets.select(
                F.col("key").alias("key_b"),
                F.col("sh_set").alias("set_b"),
                F.col("set_size").alias("size_b"),
            ),
            "key_b",
        )
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "key_a", "key_b", "jaccard"
    )


def simhash(
    df: DataFrame, text_col: str, key_col: str, bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash fingerprint per doc (sign of per-bit weighted sums of word
    hashes). Pure column expressions: explode words → 64 conditional sums → pack.

    ``hash_fn='md5'``: per-word bits come from md5 (bits 0-59 from the first 15
    hex chars, 60-63 from the 16th) — engine-portable, so the full fingerprint
    and band pipeline has an exact DuckDB twin at the oracle gate.
    """
    words = df.select(
        F.col(key_col).alias("key"),
        F.explode(normalized_words(F.col(text_col))).alias("word"),
    ).filter(F.length("word") > 0)
    if hash_fn == "xxhash64":
        h = F.xxhash64("word")
        bit_of = lambda b: F.shiftright(h, b).bitwiseAND(F.lit(1))  # noqa: E731
    elif hash_fn == "md5":
        h60 = _md5_word_hash60(F.col("word"))
        h4 = F.conv(F.substring(F.md5("word"), 16, 1), 16, 10).cast("long")
        bit_of = lambda b: (  # noqa: E731
            F.shiftright(h60, b) if b < 60 else F.shiftright(h4, b - 60)
        ).bitwiseAND(F.lit(1))
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    sums = [
        F.sum(F.when(bit_of(b) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = words.groupBy("key").agg(*sums)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select("key", fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, key_col: str, max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-pairs: band the 64-bit simhash into 4×16-bit chunks; any pair
    within hamming distance 3 must agree on ≥1 chunk (pigeonhole) → equi-join per
    chunk, then exact hamming filter via bit_count(xor)."""
    fp = simhash(df, text_col, key_col, hash_fn=hash_fn)
    chunks = fp.select(
        "key",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("key", "simhash", "c.chunk", "c.val")
    x, y = chunks.alias("x"), chunks.alias("y")
    return (
        x.join(y, on=["chunk", "val"])
        .filter(F.col("x.key") < F.col("y.key"))
        .select(
            F.col("x.key").alias("key_a"),
            F.col("y.key").alias("key_b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    key_col: str = "key",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Min-label propagation + pointer doubling over near-dup pairs →
    (key, cluster_rep).

    ``pairs``: (key_a, key_b) undirected edges; ``nodes``: all keys (singletons
    keep themselves as rep). Each round does (a) edge propagation — per-key min
    of neighbor labels — then (b) a pointer jump L(v) ← L(L(v)) (path
    compression, the large-star/small-star idea from MapReduce CC). Label-chain
    depth roughly doubles away each round, so rounds grow as O(log diameter)
    instead of O(diameter): a 200-node path converges in ~8 rounds where plain
    propagation needs 199 (pytest-pinned). Near-dup clusters are small and
    dense, so the common case stays 2-3 rounds; the log bound is what keeps a
    templated chain from aborting at 100 TB. The loop is driver-side control
    flow over fully distributed joins — no collected data.

    Lineage is truncated each round: ``localCheckpoint`` by default (fine on
    local/single-JVM; lost on executor death), or reliable ``checkpoint`` into
    ``checkpoint_dir`` when set — the cluster-scale option (survives executor
    loss at the cost of a DFS write per round)."""
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    edges = ckpt(
        pairs.select(F.col("key_a").alias("a"), F.col("key_b").alias("b"))
        .unionByName(
            pairs.select(F.col("key_b").alias("a"), F.col("key_a").alias("b"))
        )
        .distinct()
    )
    labels = ckpt(
        nodes.select(F.col(key_col).alias("a"), F.col(key_col).alias("lbl"))
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("a", "b2"), edges.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        propagated = labels.join(nbr_min, on="a", how="left").select(
            "a",
            F.least(
                F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        # pointer jump: follow the label one hop (L ∘ L). Labels are always
        # node keys, so the lookup side is `propagated` itself; left join +
        # coalesce only guards a root's self-label.
        jump_tbl = propagated.select(
            F.col("a").alias("lbl"), F.col("lbl").alias("__lbl2")
        )
        new_labels = ckpt(
            propagated.join(jump_tbl, on="lbl", how="left")
            .select(
                "a",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("__lbl2"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("lbl", "__old"), on="a"
            )
            .filter(F.col("lbl") < F.col("__old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # the budget ran out while the last round still improved labels — that
        # round may ALSO have been the one that reached the fixed point, so run
        # one verification round before declaring non-convergence. Never
        # silently return unconverged labels: a chain with diameter > max_iter
        # would split one true cluster into several and dedup would keep extra
        # "survivors".
        nbr_min = (
            edges.join(labels.withColumnRenamed("a", "b2"), edges.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        still = (
            labels.join(nbr_min, on="a", how="left")
            .filter(F.coalesce(F.col("nbr_lbl"), F.col("lbl")) < F.col("lbl"))
            .limit(1)
            .count()
        )
        if still > 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} iterations "
                "— raise max_iter (rounds needed grow with near-dup chain "
                "diameter)"
            )
    return labels.select(F.col("a").alias(key_col), F.col("lbl").alias("cluster_rep"))


def _survivors_from_rep_comps(rm: DataFrame, comps: DataFrame, key_col: str) -> DataFrame:
    """Fan the representative-level component labels back to every doc.

    Exact-dup members are connected to their rep by definition (jaccard 1.0),
    so they inherit the rep's component; the rep is already the min key of its
    exact cluster, so the component's min-key label is unchanged by skipping
    the members — no pair expansion is ever materialized."""
    return (
        rm.join(comps.withColumnRenamed("key", "__rep"), "__rep")
        .select(
            F.col("key").alias(key_col),
            F.col("cluster_rep"),
            (F.col("key") == F.col("cluster_rep")).alias("is_survivor"),
        )
    )


def dedup_survivors(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n: int = 1,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end near-duplicate dedup DECISION: jaccard pairs → connected
    components → one survivor (min key) per cluster.

    Output: (key, cluster_rep, is_survivor) for every document. Exact
    duplicates are collapsed BEFORE candidate generation and components run
    over representatives only — a mega-cluster of identical docs costs O(n)
    here, never O(n²) pairs (see _exact_rep_map)."""
    rm = _exact_rep_map(df, text_col, key_col).localCheckpoint()
    reps_keys = rm.filter(F.col("key") == F.col("__rep"))
    reps = df.join(reps_keys.select(F.col("key").alias(key_col)), key_col)
    pairs = ngram_jaccard_pairs(
        reps, text_col, key_col, n=n, threshold=threshold, collapse_exact=False
    )
    comps = connected_components(pairs, reps_keys.select("key"), "key")
    return _survivors_from_rep_comps(rm, comps, key_col)


def dedup_survivors_lsh(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n: int = 1,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
    _assert_max_candidates: int | None = None,
) -> DataFrame:
    """The 100 TB path of the dedup decision: MinHash-LSH candidate pairs
    (equi-join on band buckets, exact-verify on candidates only) → connected
    components → one survivor per cluster. Same output contract as
    dedup_survivors; candidate generation never goes O(n²) — exact duplicates
    are collapsed first, so band buckets are only as hot as TRUE near-dup
    clusters, and the decision is fanned back through the digest map without
    materializing intra-cluster pairs."""
    rm = _exact_rep_map(df, text_col, key_col).localCheckpoint()
    reps_keys = rm.filter(F.col("key") == F.col("__rep"))
    reps = df.join(reps_keys.select(F.col("key").alias(key_col)), key_col)
    pairs = minhash_lsh_pairs(
        reps, text_col, key_col, n=n, num_hashes=num_hashes, bands=bands,
        threshold=threshold, collapse_exact=False,
        max_bucket_size=max_bucket_size,
        _assert_max_candidates=_assert_max_candidates,
    )
    comps = connected_components(pairs, reps_keys.select("key"), "key")
    return _survivors_from_rep_comps(rm, comps, key_col)


def embedding_neardup_pairs_bruteforce(
    df: DataFrame, vec_col: str, key_col: str, threshold: float = 0.95
) -> DataFrame:
    """All-pairs cosine near-duplicates — the O(n²) brute-force TEST ORACLE only.
    The primary path is :func:`embedding_neardup_pairs` (metric-blocked)."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    v = df.select(
        F.col(key_col).alias("key"), F.col(vec_col).alias("vec"), norm.alias("norm")
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a.key") < F.col("b.key"))
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    key_col: str,
    threshold: float = 0.95,
    num_lists: int = 16,
    seed: int = 7,
    tile_size: int = 4096,
    _assert_max_group_rows: int | None = None,
) -> DataFrame:
    """EXACT cosine near-duplicate pairs via metric blocking — no Cartesian product.

    cosine(a,b) ≥ t  ⟺  ‖â−b̂‖ ≤ R = √(2−2t) on the normalized vectors, so the
    search is a fixed-radius euclidean join. Blocking: IVF-assign each normalized
    vector to its nearest of ``num_lists`` deterministic centroids; by the
    triangle inequality a pair in lists (i,j) satisfies
    ‖â−b̂‖ ≥ d(cᵢ,cⱼ) − rᵢ − rⱼ (rᵢ = list radius), so any list pair with
    d(cᵢ,cⱼ) − rᵢ − rⱼ > R provably holds no result and is pruned. Survivor list
    pairs (tiny: ≤ num_lists², computed from collected centroid/radius metadata)
    drive two equi-joins whose fan-out enumerates exactly the un-pruned blocks —
    the plan is broadcast + hash joins, never a CartesianProduct node, and work
    is partitioned by list pair across the cluster.

    Completeness is unconditional (pure triangle inequality — the output equals
    the brute-force pair set at ANY threshold); pruning *strength* scales with
    threshold tightness and data clusteredness: at a real near-dup threshold
    (t≥0.9, R≤0.45) most of the num_lists² blocks are pruned, while adversarially
    loose thresholds (R ≈ random-pair distance) degrade gracefully toward the
    unavoidable Ω(n²) exact-search bound — distributed, not single-partition.

    Verification is VECTORIZED: each surviving block is one Arrow group and
    its all-pairs cosine is a single numpy matmul (``applyInPandas``) — the one
    place a Pandas UDF beats JVM expressions, because a per-row ``aggregate``/
    ``zip_with`` dot product materializes every joined row with both arrays
    (measured 5× slower than the BLAS path at 12.5M pairs).

    Group memory is BOUNDED: each list is hash-tiled into
    ``ceil(|list| / tile_size)`` tiles and the Arrow group key is
    ``(pair_id, tile_a, tile_b)`` (block-matmul decomposition), so a group
    holds ~2·tile_size vectors regardless of data size — a skewed mega-list
    costs more groups, never a bigger group. Each unordered doc pair still
    lands in exactly one group (cross-list: its unique (tile_a, tile_b);
    same-list: the ordered tile pair (min, max), triangle-only when equal),
    so output equality with brute force is exact by construction. Replication
    cost is |side| · n_tiles_other rows ≈ (candidate pairs / tile_size)
    vectors shipped — asymptotically free next to the n_a·n_b·dim verify
    flops the candidate block already implies.
    """
    import numpy as np
    import pandas as pd

    from concepts_pipeline_spark.operators.similarity import ivf_assign

    R = (max(0.0, 2.0 - 2.0 * threshold)) ** 0.5
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(vec_col).alias("vec"),
        norm.alias("norm"),
    ).filter(F.col("norm") > 0)
    unit = base.select(
        "key", "vec", "norm",
        F.transform("vec", lambda x: x / F.col("norm")).alias("uvec"),
    )
    assign, centroids = ivf_assign(unit, "uvec", "key", num_lists, seed)
    assign = assign.join(base.select("key", "vec", "norm"), "key")

    # per-list radius: max distance of a member's unit vector to its centroid
    cdist = F.sqrt(
        F.aggregate(
            F.zip_with("uvec", "centroid", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    radii = (
        assign.join(F.broadcast(centroids), "list_id")
        .select("list_id", cdist.alias("d"))
        .groupBy("list_id")
        .agg(F.max("d").alias("radius"), F.count("*").alias("members"))
    )
    # centroid/radius/count metadata is O(num_lists) — collect and prune list
    # pairs driver-side (same pattern as ivf_assign's centroid ranking collect)
    meta = {
        r["list_id"]: (r["centroid"], r["radius"], r["members"])
        for r in centroids.join(radii, "list_id").collect()
    }

    def d(u, v):
        return sum((x - y) ** 2 for x, y in zip(u, v)) ** 0.5

    lids = sorted(meta)
    lp = [
        (pid, li, lj)
        for pid, (li, lj) in enumerate(
            (li, lj)
            for i, li in enumerate(lids)
            for lj in lids[i:]
            if d(meta[li][0], meta[lj][0]) - meta[li][1] - meta[lj][1] <= R
        )
    ]
    spark = df.sparkSession
    key_dt = df.schema[key_col].dataType.simpleString()
    out_schema = f"key_a {key_dt}, key_b {key_dt}, cosine double"
    if not lp:
        return spark.createDataFrame([], out_schema)

    def n_tiles(lid: str) -> int:
        return max(1, -(-int(meta[lid][2]) // tile_size))

    # one enumeration row per (block pair, participating list, other-side tile):
    # a member computes its own hash tile row-side and is replicated once per
    # other-side tile, so the group key (pair_id, tile_a, tile_b) partitions
    # the |a|×|b| verify matmul into bounded blocks. Enumeration size is
    # Σ(n_tiles_a + n_tiles_b) over surviving pairs — driver-cheap.
    enum_rows: list[tuple[int, str, str, int, int]] = []
    for pid, li, lj in lp:
        if li == lj:
            n = n_tiles(li)
            for u in range(n):
                enum_rows.append((pid, li, "s", u, n))
        else:
            na_, nb_ = n_tiles(li), n_tiles(lj)
            for ob in range(nb_):
                enum_rows.append((pid, li, "a", ob, na_))
            for oa in range(na_):
                enum_rows.append((pid, lj, "b", oa, nb_))
    tiles = spark.createDataFrame(
        enum_rows,
        "pair_id long, list_id string, side string, other_tile int, own_tiles int",
    )
    own = F.pmod(F.xxhash64("key"), F.col("own_tiles")).cast("int")
    other = F.col("other_tile")
    tagged = (
        assign.join(F.broadcast(tiles), "list_id")
        .withColumn("__own", own)
        .select(
            "pair_id", "key", "vec", "norm",
            F.when(F.col("side") == "a", F.col("__own"))
            .when(F.col("side") == "b", other)
            .otherwise(F.least("__own", other))
            .alias("__ta"),
            F.when(F.col("side") == "a", other)
            .when(F.col("side") == "b", F.col("__own"))
            .otherwise(F.greatest("__own", other))
            .alias("__tb"),
            F.when(F.col("side") == "a", F.lit(True))
            .when(F.col("side") == "b", F.lit(False))
            .otherwise(F.col("__own") <= other)
            .alias("__is_a"),
        )
    )

    thr = float(threshold)
    max_rows = _assert_max_group_rows

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if max_rows is not None and len(pdf) > max_rows:
            raise AssertionError(
                f"verify group holds {len(pdf)} rows > bound {max_rows}"
            )
        a = pdf[pdf["__is_a"]].sort_values("key")
        b = pdf[~pdf["__is_a"]]
        keys_a = a["key"].to_numpy()
        va = np.stack(a["vec"].to_numpy())
        na = a["norm"].to_numpy()
        if len(b):  # cross-list block: every (a, b) combo, ordered output keys
            keys_b = b["key"].to_numpy()
            vb = np.stack(b["vec"].to_numpy())
            nb = b["norm"].to_numpy()
            cos = np.round((va @ vb.T) / np.outer(na, nb), 6)
            ia, ib = np.nonzero(cos >= thr)
            ka, kb = keys_a[ia], keys_b[ib]
            lo = np.minimum(ka, kb)
            hi = np.maximum(ka, kb)
            return pd.DataFrame({"key_a": lo, "key_b": hi, "cosine": cos[ia, ib]})
        # same-list block: strict upper triangle in key order
        cos = np.round((va @ va.T) / np.outer(na, na), 6)
        ia, ib = np.nonzero(np.triu(cos >= thr, k=1))
        return pd.DataFrame(
            {"key_a": keys_a[ia], "key_b": keys_a[ib], "cosine": cos[ia, ib]}
        )

    return tagged.groupBy("pair_id", "__ta", "__tb").applyInPandas(
        verify, schema=out_schema
    )
