"""Token-stream operators for training-data pipelines: sequence packing,
train/benchmark decontamination, and vocabulary statistics.

The reference pipeline stops at per-document records (aggregator writes one
document per concept/work; SURVEY.md §2.5) — a pretraining pipeline needs the
next step: turning the per-document token arrays of the target table
(``doc_id, tokens: array<int32>, n_tok, source`` — the input_hint shape) into
fixed-length training sequences, proving the training split is not
contaminated by the benchmark split, and summarizing the corpus vocabulary.

All operators are declarative DataFrame plans (no RDDs, no driver collect on
the data path):

- ``pack_sequences`` — GLOBAL running token offset via the classic distributed
  prefix-sum: range-repartition on the order key, per-partition window cumsum
  (parallel), then an exclusive scan over the O(num_partitions) per-partition
  totals (a single-partition window over P rows — metadata, not data)
  broadcast-joined back. No global single-partition window ever touches the
  data, so the plan holds at 10^10 rows: the only sequential piece is P rows.
- ``pack_token_stream`` — materializes the packed sequences themselves
  (concat-and-chunk, GPT-style): each document is decomposed into its spanned
  (seq_id, piece) slices with built-in higher-order functions, then one
  hash-shuffle on seq_id reassembles fixed-length sequences. Piece
  decomposition is map-side; the shuffle carries each token exactly once.
- ``ngram_decontaminate`` — inverted-index equi-join on word n-gram shingles
  between the train and benchmark sides (never a cross join); per-train-doc
  contamination counts come from one aggregate over the joined index.
- ``token_vocab_topk`` — explode → partial-agg count/countDistinct → top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_ngrams


def global_running_offsets(
    df: DataFrame,
    len_col: str,
    order_col: str,
    num_partitions: int | None = None,
    _checkpoint: bool = True,
) -> DataFrame:
    """Add ``tok_start``/``tok_end`` — the global exclusive/inclusive running
    totals of ``len_col`` in ``order_col`` order — without a global
    single-partition window.

    Two-phase distributed prefix sum:

    1. ``repartitionByRange(order_col)`` puts partition *i*'s keys strictly
       below partition *i+1*'s; a per-partition window (parallel across
       partitions) computes local cumulative sums.
    2. Per-partition totals (one row per partition) get an exclusive scan —
       a window over O(P) metadata rows — and are broadcast-joined back.

    The intermediate is pinned with ``localCheckpoint`` so the range
    partition ids are computed exactly once (range boundary sampling must not
    re-run between the totals pass and the join pass). At cluster scale swap
    in a durable checkpoint dir via ``df.sparkSession.sparkContext.
    setCheckpointDir`` + ``.checkpoint()`` — same trade as
    ``connected_components`` (dedup.py).

    ``order_col`` values must be unique (they define the pack order).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = parts.withColumn(
        "__local_end", F.sum(F.col(len_col).cast("long")).over(w)
    )
    if _checkpoint:
        # pins the range partition ids (see docstring); _checkpoint=False is
        # for plan inspection ONLY (tools/plan_audit.py) — the checkpoint
        # truncates explain() lineage, hiding the range exchange it asserts on
        local = local.localCheckpoint()
    totals = local.groupBy("__pid").agg(F.max("__local_end").alias("__total"))
    # exclusive scan over one row per partition: single-partition window over
    # P metadata rows, not a data-path bottleneck
    wtot = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__total").over(wtot), F.lit(0)).alias("__part_offset"),
    )
    out = local.join(F.broadcast(offsets), "__pid")
    return (
        out.withColumn(
            "tok_end", (F.col("__part_offset") + F.col("__local_end")).cast("long")
        )
        .withColumn(
            "tok_start", (F.col("tok_end") - F.col(len_col).cast("long")).cast("long")
        )
        .drop("__pid", "__local_end", "__part_offset")
    )


def pack_sequences(
    df: DataFrame,
    len_col: str = "n_tok",
    key_col: str = "doc_id",
    seq_len: int = 512,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Plan the concat-and-chunk packing of documents into fixed-length
    training sequences: every document gets its global token offset and the
    range of sequence ids it lands in.

    Packing rule (deterministic, the standard pretraining concat-and-chunk):
    documents are concatenated in ``order_col`` order into one virtual token
    stream, which is chunked into back-to-back windows of ``seq_len`` tokens;
    a document may straddle a chunk boundary (``seqs_spanned`` > 1).

    Returns ``(key, len, tok_start, seq_id, seq_offset, seqs_spanned)`` where
    ``seq_id`` is the first sequence the document touches and ``seq_offset``
    its position inside it. Zero-length documents are excluded (they occupy
    no tokens).
    """
    order_col = order_col or key_col
    # the prefix sum only needs (key, order, len): prune BEFORE the range
    # shuffle + checkpoint so token arrays never ride the offset computation —
    # payload columns rejoin downstream (pack_token_stream) on the key
    slim_cols = list(dict.fromkeys([key_col, order_col, len_col]))
    nonempty = df.select(*slim_cols).filter(F.col(len_col) > 0)
    offs = global_running_offsets(nonempty, len_col, order_col, num_partitions)
    L = F.lit(int(seq_len)).cast("long")
    seq_id = F.floor(F.col("tok_start") / L).cast("long")
    seq_last = F.floor((F.col("tok_end") - 1) / L).cast("long")
    return offs.select(
        F.col(key_col),
        F.col(len_col).cast("long").alias(len_col),
        "tok_start",
        seq_id.alias("seq_id"),
        F.pmod(F.col("tok_start"), L).cast("long").alias("seq_offset"),
        (seq_last - seq_id + 1).cast("long").alias("seqs_spanned"),
    )


def pack_token_stream(
    df: DataFrame,
    tokens_col: str = "tokens",
    len_col: str = "n_tok",
    key_col: str = "doc_id",
    seq_len: int = 512,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Materialize the packed fixed-length training sequences themselves.

    Each document is split map-side into the slices that fall in each spanned
    sequence (built-in ``sequence``/``transform``/``slice`` — whole-stage
    codegen, no Python), then one hash-shuffle on ``seq_id`` reassembles each
    sequence from its ordered pieces. Every token crosses the wire exactly
    once; no task ever holds more than one sequence's tokens plus its input
    split, so memory is bounded by ``seq_len``, not corpus size.

    Returns ``(seq_id, tokens, n_tok)``; all sequences have exactly
    ``seq_len`` tokens except the final partial one.
    """
    order_col = order_col or key_col
    plan = pack_sequences(df, len_col, key_col, seq_len, order_col, num_partitions)
    src = df.select(F.col(key_col), F.col(tokens_col).alias("__toks"))
    j = plan.join(src, key_col)
    L = F.lit(int(seq_len)).cast("long")
    tok_end = F.col("tok_start") + F.col(len_col)
    # map-side piece decomposition: for each sequence s this doc touches,
    # the intersection of [tok_start, tok_end) with [s*L, (s+1)*L)
    pieces = F.transform(
        F.sequence(F.col("seq_id"), F.col("seq_id") + F.col("seqs_spanned") - 1),
        lambda s: F.struct(
            s.alias("piece_seq"),
            F.greatest(s * L - F.col("tok_start"), F.lit(0).cast("long")).alias(
                "off_in_doc"
            ),
            (
                F.least(tok_end, (s + 1) * L) - F.greatest(F.col("tok_start"), s * L)
            ).alias("piece_len"),
            F.greatest(F.col("tok_start") - s * L, F.lit(0).cast("long")).alias(
                "off_in_seq"
            ),
        ),
    )
    exploded = j.select(
        F.col("__toks"), F.explode(pieces).alias("p")
    ).select(
        F.col("p.piece_seq").alias("seq_id"),
        F.col("p.off_in_seq").alias("off_in_seq"),
        F.slice(
            F.col("__toks"), (F.col("p.off_in_doc") + 1).cast("int"), F.col("p.piece_len").cast("int")
        ).alias("piece"),
    )
    return (
        exploded.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("off_in_seq", "piece"))),
                    lambda x: x["piece"],
                )
            ).alias(tokens_col)
        )
        .select(
            "seq_id",
            tokens_col,
            F.size(tokens_col).cast("long").alias(len_col),
        )
    )


def ngram_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-train-document benchmark contamination via word n-gram overlap
    (the standard pretraining decontamination check, e.g. 13-gram overlap in
    GPT-3's cleanup — ``n`` is a parameter; tests use smaller n on small docs).

    Inverted-index LEFT join from the train shingle index to the benchmark
    shingle index (docs only meet on shared shingles — never a cross join),
    then one aggregate per train doc:

    - ``n_shingles``      distinct shingles in the train doc
    - ``n_contaminated``  of those, how many appear in ANY benchmark doc
    - ``n_bench_docs``    distinct benchmark docs sharing ≥1 shingle
    - ``contamination_ratio`` = n_contaminated / n_shingles (round 6)
    - ``contaminated``    ratio > 0

    Scale: the join keys on shingle content, so hot keys are only as hot as a
    shingle is common; at 100 TB pre-filter stop-shingles (document frequency
    cap) exactly like the LSH band path caps bucket width.
    """
    t = word_ngrams(train, text_col, key_col, n)
    b = (
        word_ngrams(bench, text_col, key_col, n)
        .withColumnRenamed("key", "bench_key")
    )
    joined = t.join(b, "shingle", "left")
    return (
        joined.groupBy("key")
        .agg(
            F.countDistinct("shingle").alias("n_shingles"),
            F.countDistinct(
                F.when(F.col("bench_key").isNotNull(), F.col("shingle"))
            ).alias("n_contaminated"),
            F.countDistinct("bench_key").alias("n_bench_docs"),
        )
        .select(
            F.col("key").alias(key_col),
            "n_shingles",
            "n_contaminated",
            "n_bench_docs",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination_ratio"
            ),
            (F.col("n_contaminated") > 0).alias("contaminated"),
        )
    )


def token_vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    pattern: str | None = None,
    k: int = 100,
) -> DataFrame:
    """Top-k corpus vocabulary: lexical token → total occurrences + document
    frequency, ordered by (count desc, token asc) — a total order, so the
    k-cut is deterministic. Explode → two-level aggregate (map-side partial
    count) → ``TakeOrderedAndProject``; no full sort materializes.
    """
    from .textstats import BPE_ISH_PATTERN

    pat = pattern or BPE_ISH_PATTERN
    toks = df.select(
        F.col(key_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(
            "token"
        ),
    )
    agg = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct(key_col).alias("n_docs"),
    )
    return agg.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)


def remap_tokens(
    df: DataFrame,
    mapping: DataFrame,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    drop_unmapped: bool = False,
) -> DataFrame:
    """Tokenizer migration / vocabulary surgery: rewrite every token array
    through a (old_id → new_id) mapping table — the re-tokenization step a
    training pipeline runs when the vocabulary changes (merged BPE ranks,
    reserved-id moves, vocab truncation).

    ``mapping``: DataFrame with columns (old_id, new_id). Tokens absent from
    the mapping pass through unchanged (identity default) unless
    ``drop_unmapped=True``, which removes them (vocab truncation semantics).

    Scale shape: a map-literal expression would cap at expression-tree limits
    (a real vocab is 10^5-10^6 entries) and a per-row Python UDF would leave
    the JVM. Instead: ``posexplode`` the arrays (each token crosses once),
    ONE equi-join against the mapping — Spark broadcasts it when small, and a
    10^6-row mapping is still far under any broadcast threshold worth raising
    — then re-aggregate ordered by position. Order restoration uses
    array_sort over (pos, token) structs inside the aggregation buffer: no
    window, no second shuffle beyond the re-grouping one.

    Output: the input columns with ``tokens_col`` rewritten and ``n_tok``
    (when present) recomputed.
    """
    other = [c for c in df.columns if c != tokens_col]
    # posexplode_outer collapses NULL and [] to the same single NULL-pos row;
    # carry the nullness through so they re-aggregate distinguishably
    exploded = df.withColumn("__was_null", F.col(tokens_col).isNull()).select(
        *other, "__was_null",
        F.posexplode_outer(F.col(tokens_col)).alias("__pos", "__old"),
    )
    other = [*other, "__was_null"]
    m = mapping.select(
        F.col("old_id").alias("__old"), F.col("new_id").alias("__new")
    )
    joined = exploded.join(F.broadcast(m), "__old", "left")
    mapped = F.coalesce(
        "__new", F.lit(None) if drop_unmapped else F.col("__old")
    )
    joined = joined.withColumn("__m", mapped)
    if drop_unmapped:
        joined = joined.filter(
            F.col("__m").isNotNull() | F.col("__pos").isNull()
        )
    # a NULL __pos row marks a doc whose array was NULL (posexplode_outer):
    # re-aggregate it back to a NULL array, not an empty one
    regrouped = (
        joined.groupBy(*other)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", F.col("__m").alias("t")))
            ).alias("__pairs")
        )
        .withColumn(
            tokens_col,
            F.when(
                F.col("__was_null"),
                F.lit(None).cast(df.schema[tokens_col].dataType),
            ).otherwise(
                F.filter(
                    F.transform("__pairs", lambda p: p["t"]),
                    lambda t: t.isNotNull(),
                ).cast(df.schema[tokens_col].dataType)
            ),
        )
        .drop("__pairs")
    )
    if "n_tok" in other:
        regrouped = regrouped.withColumn(
            "n_tok",
            F.when(F.col(tokens_col).isNull(), F.lit(None))
            .otherwise(F.size(tokens_col))
            .cast(df.schema["n_tok"].dataType),
        )
    return regrouped.select(*df.columns)
