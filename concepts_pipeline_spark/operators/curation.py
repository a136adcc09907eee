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
    hash-cell per source:

      1. aggregate token sums per (source, hex4-cell) — 65,536 cells max per
         source, map-side partial agg;
      2. driver-side exclusive prefix sum over each source's cell list
         (O(sources × cells) metadata, broadcast back);
      3. cells fully inside the budget are kept with NO window; cells fully
         outside are dropped; exactly ONE boundary cell per source runs the
         within-cell window (≈ 1/65,536 of the source's rows).

    Output: the input columns plus the assigned cell — only surviving rows.
    """
    cell = _hex4(F.col(key_col), salt).alias("__cell")
    with_cell = df.withColumn("__cell", cell)

    per_cell = (
        with_cell.groupBy(source_col, "__cell")
        .agg(F.sum(F.col(token_col).cast("long")).alias("__cell_toks"))
    )
    # O(sources × occupied-cells) metadata — the only driver-side step
    rows = per_cell.collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r[source_col], []).append((r["__cell"], r["__cell_toks"]))

    keep_whole: list[tuple[str, str]] = []  # (source, cell) fully within budget
    boundary: dict[str, tuple[str, int]] = {}  # source -> (cell, budget_left)
    for src, cells in by_source.items():
        b = budget.get(src, 0) if isinstance(budget, dict) else budget
        cells.sort()
        run = 0
        for cx, toks in cells:
            if run + toks <= b:
                keep_whole.append((src, cx))
                run += toks
            else:
                # left == 0 still needs the boundary window: the spec keeps
                # zero-token docs whose running sum EQUALS the budget (cum <=
                # budget), and a mixed cell's leading zeros qualify
                left = b - run
                if left >= 0:
                    boundary[src] = (cx, left)
                break

    spark = df.sparkSession
    whole_df = spark.createDataFrame(
        keep_whole or [("", "")], f"{source_col} string, __cell string"
    )
    kept = with_cell.join(
        F.broadcast(whole_df), on=[source_col, "__cell"], how="left_semi"
    )

    if boundary:
        bound_df = spark.createDataFrame(
            [(s, c, l) for s, (c, l) in boundary.items()],
            f"{source_col} string, __cell string, __left long",
        )
        from pyspark.sql.window import Window

        edge = with_cell.join(
            F.broadcast(bound_df), on=[source_col, "__cell"], how="inner"
        )
        w = (
            Window.partitionBy(source_col, "__cell")
            .orderBy(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), key_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        edge_kept = (
            edge.withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
            .filter(F.col("__cum") <= F.col("__left"))
            .drop("__cum", "__left")
        )
        kept = kept.unionByName(edge_kept)
    return kept


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
