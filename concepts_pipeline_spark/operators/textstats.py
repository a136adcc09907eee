"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (whole-stage codegen).

These generalize the reference's per-line transforms (ingestor Transformer.scala
string ops; SURVEY §2.2) to the text-quality toolkit a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_words

# tiny deterministic stopword lists — heuristic language ID, not a model
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text_col) -> F.Column:
    """Whitespace token count."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text_col) -> F.Column:
    """Count of BPE-ish lexical tokens (letters runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_ISH_PATTERN), 0))


def stopword_hits(text_col, lang: str = "en") -> F.Column:
    """How many words are in the language's stopword list."""
    words = normalized_words(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token counts, mean word length, punctuation and
    stopword ratios, and a composite score in [0,1]. The word array is split
    once and shared across the derived features."""
    t = F.col(text_col)
    df = df.withColumn("__qw", normalized_words(t))
    words = F.col("__qw")
    n_words = token_count(t)
    n_chars = F.length(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    mean_wlen = F.when(
        F.size(words) > 0,
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / F.size(words),
    ).otherwise(F.lit(0.0))
    sw_en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    en_hits = F.size(F.filter(words, lambda w: F.array_contains(sw_en, w)))
    stop_ratio = F.when(n_words > 0, en_hits / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.5))
        - F.when(stop_ratio < 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        - F.when(n_words < 5, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.withColumns(
        {
            "n_words": n_words.cast("int"),
            "n_tokens_bpe": bpe_ish_token_count(t).cast("int"),
            "mean_word_len": F.round(mean_wlen, 6),
            "punct_ratio": F.round(punct_ratio, 6),
            "stopword_ratio": F.round(stop_ratio, 6),
            "quality_score": F.round(score, 6),
        }
    ).drop("__qw")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts.

    Ties break by language name order (deterministic). 'und' when no hits at all.
    The normalized word array is materialized ONCE as a column and shared by all
    per-language counters (the naive formulation re-splits the text per language
    — 4× the regex work; Catalyst does not CSE across separate expressions)."""
    langs = sorted(STOPWORDS)
    with_words = df.withColumn("__words", normalized_words(F.col(text_col)))
    words = F.col("__words")
    def hit_count(lg: str) -> F.Column:
        sw = F.array(*[F.lit(x) for x in STOPWORDS[lg]])
        return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))

    hits = F.array(
        *[
            F.struct(hit_count(lg).cast("int").alias("hits"), F.lit(lg).alias("lang"))
            for lg in langs
        ]
    )
    max_hits = F.array_max(F.transform(hits, lambda s: s["hits"]))
    winner = F.array_min(F.filter(hits, lambda s: s["hits"] == max_hits))["lang"]
    return with_words.withColumn(
        "detected_lang",
        F.when(max_hits > 0, winner).otherwise(F.lit("und")),
    ).drop("__words")


def _positional_ngrams(words, n: int):
    """ALL word n-grams in order (NOT distinct — frequency matters here, unlike
    dedup.word_ngrams' shingle sets). Empty array when the doc is shorter than n."""
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    top_ns: tuple = (2, 3),
    dup_ns: tuple = (5,),
) -> DataFrame:
    """Repetition-based quality features per document, after the published
    Gopher/MassiveText repetition filters (Rae et al. 2021, table A1):

    - ``word_rep_ratio``    1 − distinct_words/total_words (pure expression)
    - ``top_{n}gram_frac``  occurrences of the most frequent word n-gram over
                            total n-gram occurrences, for n in ``top_ns``
    - ``dup_{n}gram_frac``  fraction of n-gram occurrences belonging to grams
                            seen more than once, for n in ``dup_ns``
    - ``is_repetitive``     composite flag at the Gopher-style thresholds
                            (top-2 > 0.20, top-3 > 0.18, dup-5 > 0.15)

    Fractions are occurrence-count based (the paper weights by characters; the
    count variant keeps the whole computation in integer space and is the
    documented spec here).

    Scale shape: ONE explode over all requested n sizes tagged by n, then two
    hash aggregations — (key, n, gram) counts and a per-(key, n) max/sum fold —
    both with map-side partial aggregation; the per-doc pivot is a conditional
    agg, not a join. No window over the exploded stream, no per-row Python.
    Docs shorter than n contribute no rows for that n and coalesce to 0.0.
    """
    t = F.col(text_col)
    base = df.select(F.col(key_col), t.alias("__text")).withColumn(
        "__words", normalized_words(F.col("__text"))
    )
    words = F.col("__words")

    def _tag(n: int):
        # NB: must be a ONE-argument lambda — transform() treats a second
        # lambda parameter as the element index, not a closure default
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(
        F.array(
            *[
                F.transform(_positional_ngrams(words, n), _tag(n))
                for n in (*top_ns, *dup_ns)
            ]
        )
    )
    ex = base.select(key_col, F.explode(tagged).alias("g")).select(
        key_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    )
    counts = ex.groupBy(key_col, "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_n = counts.groupBy(key_col, "n").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("total"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup_cnt"
        ),
    )
    frac_cols = {}
    for n in top_ns:
        frac_cols[f"top_{n}gram_frac"] = F.max(
            F.when(F.col("n") == n, F.col("top_cnt") / F.col("total"))
        )
    for n in dup_ns:
        frac_cols[f"dup_{n}gram_frac"] = F.max(
            F.when(F.col("n") == n, F.col("dup_cnt") / F.col("total"))
        )
    pivoted = per_n.groupBy(key_col).agg(
        *[c.alias(name) for name, c in frac_cols.items()]
    )

    wr = F.when(
        F.size(words) > 0,
        1.0 - F.size(F.array_distinct(words)) / F.size(words),
    ).otherwise(F.lit(0.0))
    out = (
        base.withColumn("word_rep_ratio", F.round(wr, 6))
        .drop("__text", "__words")
        .join(pivoted, on=key_col, how="left")
    )
    for name in frac_cols:
        out = out.withColumn(name, F.round(F.coalesce(F.col(name), F.lit(0.0)), 6))
    flag = F.lit(False)
    if 2 in top_ns:
        flag = flag | (F.col("top_2gram_frac") > 0.20)
    if 3 in top_ns:
        flag = flag | (F.col("top_3gram_frac") > 0.18)
    if 5 in dup_ns:
        flag = flag | (F.col("dup_5gram_frac") > 0.15)
    return out.withColumn("is_repetitive", flag)


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", hash_fn: str = "xxhash64"
) -> DataFrame:
    """Order-sensitive rolling fingerprint: polynomial fold of word hashes mod 2^31-1.

    aggregate() runs JVM-side per row. The modulus keeps the fold inside 63 bits
    (acc < 2^31, acc*1000003 + hash < 2^52 — no ANSI overflow). Used for cheap
    content-identity across snapshots (cf. exact_dedup's md5 which is
    order-and-content identity on the raw string).

    ``hash_fn``: the per-word hash. ``'xxhash64'`` (default) is the fast
    JVM-native path. ``'md5'`` takes the first 60 bits of md5(word) — slower,
    but bit-for-bit reproducible in any engine with md5 + hex parsing, which is
    what puts the fold logic behind the DuckDB oracle gate (the fold itself is
    identical either way)."""
    words = normalized_words(F.col(text_col))
    p = F.lit(2147483647)  # 2^31 - 1
    if hash_fn == "xxhash64":
        word_hash = lambda w: F.pmod(F.xxhash64(w), p)  # noqa: E731
    elif hash_fn == "md5":
        word_hash = lambda w: F.pmod(  # noqa: E731
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"), p
        )
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * 1000003 + word_hash(w), p),
    )
    return df.withColumn("fingerprint", fp)


# PII patterns — deliberately in the common Java-regex/RE2 subset so the same
# pattern string runs identically in Spark (Java) and DuckDB (RE2), keeping
# the operator oracle-checkable. Extend per deployment (IBANs, SSNs, ...).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    replacement: str = "<PII>",
) -> DataFrame:
    """PII detection + redaction for training corpora: per-pattern match
    counts (``n_<name>`` columns) and a ``redacted`` text column with every
    match replaced. Pure JVM regex expressions — no Python on the hot path,
    whole-stage codegen keeps this a single map over the corpus (100 TB = one
    embarrassingly parallel pass, no shuffle). Patterns apply in sorted name
    order so redaction is deterministic when patterns could overlap."""
    pats = patterns if patterns is not None else PII_PATTERNS
    out = df
    red = F.col(text_col)
    for name in sorted(pats):
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pats[name]))
        )
        red = F.regexp_replace(red, pats[name], replacement)
    return out.withColumn("redacted", red)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Corpus-self-trained unigram LM quality score (the CCNet-style
    perplexity filter, collapsed to order 1 so it needs no external model):
    score = mean over the doc's words of log10 p(word), with add-one-smoothed
    probabilities estimated from THIS corpus — gibberish and boilerplate-rare
    vocabularies score low, middle-of-the-distribution prose scores high.
    Output: (key, n_words, logprob rounded to 6dp).

    Scale shape: two aggregations and ONE equi-join on the word — explode →
    count words (map-side partial agg), broadcast nothing (the vocabulary can
    be huge; Catalyst picks sort-merge/shuffled-hash as sizes dictate), join
    the exploded stream back, partial-agg the per-doc mean. No Python, no
    window, no driver state."""
    words = df.select(
        F.col(key_col).alias("key"),
        F.explode(normalized_words(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    totals = freq.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vsize")
    )
    scored = (
        words.join(freq, "word")
        .crossJoin(F.broadcast(totals))  # one row: corpus total + vocab size
        .select(
            "key",
            (F.log10((F.col("cnt") + F.lit(1.0))
                     / (F.col("total") + F.col("vsize")))).alias("lp"),
        )
    )
    return scored.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("lp"), 6).alias("logprob"),
    )
