"""Corpus curation operators: deterministic split assignment and per-source
token-budget capping — the mixture-construction step of a training-data
pipeline (no analogue in the reference, which pipelines a single authority
corpus end to end; SURVEY §2.4 extension).

Both operators are deterministic functions of the data (content-hash driven),
so re-running the pipeline on the same corpus reproduces the same mixture —
the same idempotence discipline as the CDC engine's fenced merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 4 hex chars of md5 = 65,536 assignment cells; lexicographic comparison of
# fixed-length lowercase hex equals numeric comparison, so the SAME thresholds
# work as plain string compares in any engine (Spark and DuckDB md5 hex match
# byte for byte)
_CELLS = 16**4


def _hex4(col, salt: str):
    return F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 4)


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, exclusive_upper_hex4)] in declaration order; the last
    split absorbs rounding remainder."""
    names = list(splits)
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for name in names[:-1]:
        acc += splits[name]
        out.append((name, format(int(round(acc * _CELLS)), "04x")))
    out.append((names[-1], "ffff~"))  # past any hex4 — absorbs remainder
    return out


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row to a named split (train/val/test …) by content hash.

    Deterministic, stateless, and stable under any repartitioning or corpus
    growth: a document's split depends only on (salt, key), never on row order
    or what else is in the corpus — the property a training pipeline needs so
    that val/test membership never leaks into train across re-runs. Pure
    column expressions (one md5 per row, whole-stage codegen); changing the
    salt re-rolls the assignment.
    """
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    cell = _hex4(F.col(key_col), salt)
    expr = None
    for name, upper in split_thresholds(splits):
        cond = cell < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def cap_tokens_per_source(
    df: DataFrame,
    source_col: str = "source",
    token_col: str = "n_tok",
    key_col: str = "doc_id",
    budget: int | dict[str, int] = 100_000,
    salt: str = "cap-v1",
) -> DataFrame:
    """Keep, per source, the hash-ordered prefix of documents whose cumulative
    token count stays within ``budget`` — the sampling step that downweights
    an over-represented source to a fixed token share of the mixture.

    ``budget`` is either one uniform cap or a per-source dict (the mixture
    form — see :func:`mix_sources`); a source absent from the dict has budget
    0 and is dropped entirely.

    Semantics (the declarative spec): order each source's docs by
    (md5(salt‖key), key), keep a doc iff the running token sum INCLUDING it is
    ≤ budget. The hash order is a deterministic shuffle, so the kept prefix is
    an unbiased, reproducible sample of the source.

    Scale shape — the naive form is one window over every row of every source
    (`sum(n_tok) OVER (PARTITION BY source ORDER BY hash)`), which shuffles
    the full corpus and serializes each source through a single sorted
    partition: a hot source (half the corpus at 100 TB) becomes one task.
    This implementation gets identical output with the window confined to one
    hash-cell per source, fully distributed (no driver-side materialization):

      1. aggregate token sums per (source, hex4-cell) — 65,536 cells max per
         source, map-side partial agg;
      2. an exclusive prefix sum over each source's CELL SUMMARY (a window
         over ≤65,536 metadata rows per source — parallel across sources,
         trivial within one) finds each source's single BOUNDARY cell: the
         first cell, in hash order, whose cumulative sum overflows the
         budget. Because the kept region is a prefix, that one
         (boundary_cell, leftover_budget) row per source is the ENTIRE
         decision state — O(sources) rows, broadcast;
      3. rows in cells before the boundary are kept with NO window; rows past
         it are dropped; exactly ONE boundary cell per source runs the
         within-cell window (≈ 1/65,536 of the source's rows).

    Output: the input columns plus the assigned cell — only surviving rows.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    if isinstance(budget, dict):
        # contract (and the token_mixture oracle's WHERE source IN ...): a
        # source absent from the dict is dropped ENTIRELY — including its
        # zero-token docs, which budget-0 cum<=0 semantics would keep
        df = df.filter(F.col(source_col).isin(list(budget)))
        budget_df = spark.createDataFrame(
            [(s, int(b)) for s, b in budget.items()],
            f"{source_col} string, __budget long",
        )
    else:
        budget_df = None

    cell = _hex4(F.col(key_col), salt).alias("__cell")
    with_cell = df.withColumn("__cell", cell)

    per_cell = (
        with_cell.groupBy(source_col, "__cell")
        .agg(F.sum(F.col(token_col).cast("long")).alias("__cell_toks"))
    )
    if budget_df is not None:
        per_cell = per_cell.join(F.broadcast(budget_df), source_col, "inner")
    else:
        per_cell = per_cell.withColumn(
            "__budget", F.lit(int(budget)).cast("long")
        )

    wsrc = Window.partitionBy(source_col).orderBy("__cell")
    summary = per_cell.withColumn(
        "__excl", F.sum("__cell_toks").over(wsrc) - F.col("__cell_toks")
    )
    # the first overflowing cell per source; its exclusive prefix is the sum
    # of all kept-whole cells, so leftover = budget − excl is ≥ 0 there.
    # leftover == 0 still needs the boundary window: the spec keeps zero-token
    # docs whose running sum EQUALS the budget (cum <= budget), and a mixed
    # cell's leading zeros qualify
    bound = (
        summary.filter(
            F.col("__excl") + F.col("__cell_toks") > F.col("__budget")
        )
        .groupBy(source_col)
        .agg(
            F.min("__cell").alias("__bcell"),
            F.min_by(F.col("__budget") - F.col("__excl"), F.col("__cell")).alias(
                "__left"
            ),
        )
    )

    routed = with_cell.join(F.broadcast(bound), on=source_col, how="left")
    kept = routed.filter(
        F.col("__bcell").isNull() | (F.col("__cell") < F.col("__bcell"))
    ).drop("__bcell", "__left")

    edge = routed.filter(F.col("__cell") == F.col("__bcell"))
    w = (
        Window.partitionBy(source_col, "__cell")
        .orderBy(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge_kept = (
        edge.withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
        .filter(F.col("__cum") <= F.col("__left"))
        .drop("__cum", "__bcell", "__left")
    )
    return kept.unionByName(edge_kept)


def mixture_budgets(weights: dict[str, float], total_tokens: int) -> dict[str, int]:
    """Per-source token budgets for :func:`mix_sources` — round(), not int():
    float truncation would silently under-cap by one token for weights whose
    product is not exactly representable (0.57 × 100 → 56). Shared with the
    driver oracle so both sides compute identical budgets."""
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative mixture weights: {bad}")
    return {s: int(round(w * total_tokens)) for s, w in weights.items()}


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    token_col: str = "n_tok",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Build a token mixture: cap each source at ``weight × total_tokens``
    tokens — the pretraining mixture-weights knob (e.g. The Pile / LLaMA-style
    source proportions) expressed as per-source hash-ordered prefix sampling.

    Deterministic and reproducible (same corpus + weights + salt ⇒ same
    mixture); sources not in ``weights`` are excluded. Fractions need not sum
    to 1 — they are absolute shares of ``total_tokens``. A source with fewer
    tokens than its share contributes everything it has (the caller can
    detect under-filled shares by comparing the output's per-source sums to
    the budgets). Scale shape identical to :func:`cap_tokens_per_source`
    (whole cells join-free, one boundary-cell window per source).
    """
    budgets = mixture_budgets(weights, total_tokens)
    return cap_tokens_per_source(
        df,
        source_col=source_col,
        token_col=token_col,
        key_col=key_col,
        budget=budgets,
        salt=salt,
    )


def shuffle_epoch(
    df: DataFrame,
    seed: int | str,
    key_col: str = "doc_id",
    num_partitions: int | None = None,
    _checkpoint: bool = True,
) -> DataFrame:
    """Deterministic epoch shuffle: add ``position`` — the row's rank in a
    reproducible global permutation keyed only by ``(seed, key)``. Each
    training epoch shuffles with its own seed; re-running the pipeline (on
    any cluster topology) reproduces the identical order, unlike
    ``rand(seed)``, whose values depend on partition layout.

    Scale shape (the 100 TB question): NO single-partition global sort. The
    md5 rank key is uniform, so ``repartitionByRange`` over it splits evenly;
    the global position is recovered by the same two-phase distributed prefix
    sum as sequence packing (tokenops.global_running_offsets): per-partition
    local ranks in parallel, then an exclusive scan over O(P) partition
    totals broadcast back. Keys must be unique (they are the permutation
    domain); ties are impossible because the key itself is the rank
    tie-break.
    """
    from .tokenops import global_running_offsets

    key_s = F.col(key_col).cast("string")
    rk = F.concat(
        F.md5(F.concat_ws("\x1f", F.lit(str(seed)), key_s)),
        F.lit("\x1f"),
        key_s,
    )
    tagged = df.withColumn("__rk", rk).withColumn("__one", F.lit(1))
    out = global_running_offsets(
        tagged, "__one", "__rk", num_partitions, _checkpoint=_checkpoint
    )
    return (
        out.withColumn("position", (F.col("tok_end") - F.lit(1)).cast("long"))
        .drop("__rk", "__one", "tok_start", "tok_end")
    )


def weighted_sample(
    df: DataFrame,
    weight_col,
    key_col: str = "doc_id",
    base_rate: float = 1.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic importance sampling: keep a row with probability
    ``clamp(base_rate × weight, 0, 1)``, decided ONLY by (salt, key) — the
    quality-weighted resampling step of a curation pipeline (upsample
    high-quality sources, downsample boilerplate) with the same idempotence
    discipline as hash_split: re-running on the same corpus reproduces the
    identical sample, corpus growth never flips prior decisions, and the
    decision is a pure expression (one codegen'd map, no shuffle, no RNG
    state). Uniform driver: u = md5(salt‖key)[:13 hex] / 16^13 ∈ [0,1);
    keep iff u < p. 13 hex digits = 52 bits fit a double's mantissa exactly,
    so the arithmetic reproduces bit-identically in any engine with md5."""
    key_s = F.col(key_col).cast("string")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key_s)), 1, 13), 16, 10
    ).cast("double") / float(16 ** 13)
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0),
                                       F.lit(float(base_rate)) * weight_col))
    return df.filter(u < p)
