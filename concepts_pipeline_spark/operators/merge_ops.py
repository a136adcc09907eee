"""Relational merge/CDC helper operators (SURVEY §2.3–§2.5 inventory).

Each is the Spark-first re-expression of a reference stream stage:

- anti_join_new_keys   — NotInIndexFlow existence pre-filter (J1): keep incoming rows
                         none of whose keys are already in the target
                         (ref: aggregator/NotInIndexFlow.scala:39-149)
- anti_join_new_multi_keys — J1's multi-id survival rule: keep rows where ANY id in
                         the id-array is unseen (ref: NotInIndexFlow.scala:143)
- lookup_join          — MultiGetFlow batched keyed lookup (S9): left join, null = miss
                         (ref: recorder/MultiGetFlow.scala:20-53)
- classify_changes     — BulkUpdateFlow per-item result classification (K3):
                         created / updated / noop for a batch vs the target
                         (ref: common/.../BulkUpdateFlow.scala:123-166)
- merge_with_precedence— MergeConcepts two-source keyed merge (K1): authoritative
                         fields win, catalogue fills the rest
                         (ref: recorder/MergeConcepts.scala:11-65)
- most_specific_type   — priority-aggregate over a type array (A4)
                         (ref: recorder/MergeConcepts.scala:67-83)
- set_union_agg        — accumulate array fields per key as a sorted set union (A5)
                         (ref: aggregator/src/main/resources/append-fields.json)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference type-specificity: drop the generic ones, prefer anything specific
# (ref: recorder/MergeConcepts.scala:67-83 — drop {Agent, Concept}; if empty →
#  Agent if present else Concept; else head)
GENERIC_TYPES = ["Agent", "Concept"]


def anti_join_new_keys(
    incoming: DataFrame, target_keys: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Rows of `incoming` whose key is absent from the target (left anti join).

    Purely a merge-source shrinker, like the reference's terms-query existence check
    (1h → 6min, NotInIndexFlow.scala:35-38). Catalyst broadcast-hashes the smaller
    side automatically; at scale prefer passing a pre-projected key-only target."""
    return incoming.join(target_keys.select(*key_cols), on=key_cols, how="left_anti")


def anti_join_new_multi_keys(
    incoming: DataFrame,
    target_keys: DataFrame,
    row_key_cols: list[str],
    ids_col: str,
    target_key_col: str,
) -> DataFrame:
    """Multi-id existence pre-filter: keep incoming rows where ANY id in the
    ``ids_col`` array is absent from the target.

    This is the reference's actual survival rule — a concept with several
    canonicalIds is kept when at least one of them is not yet indexed
    (ref: aggregator/NotInIndexFlow.scala:143 `exists(id => !seen(id))`;
    ConceptsAggregator.scala:59-70), which a plain scalar anti-join inverts
    into drop-if-any-seen.

    Shape: explode ids → hash anti-join on id → distinct surviving row keys →
    left-semi original rows back. Two key-hashed shuffles, no row data moves
    through the explode (only ``row_key_cols``), target side should be
    pre-projected to its key column — all broadcast-eligible when small."""
    exploded = incoming.select(
        *row_key_cols, F.explode(ids_col).alias("__probe_id")
    )
    unseen = exploded.join(
        target_keys.select(F.col(target_key_col).alias("__probe_id")),
        on="__probe_id",
        how="left_anti",
    )
    survivor_keys = unseen.select(*row_key_cols).distinct()
    return incoming.join(survivor_keys, on=row_key_cols, how="left_semi")


def lookup_join(
    events: DataFrame, dim: DataFrame, key_cols: list[str], how: str = "left"
) -> DataFrame:
    """Batched keyed lookup as a join — missing keys yield nulls (Option.None)."""
    return events.join(dim, on=key_cols, how=how)


def classify_changes(
    batch: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Tag each batch row created/updated/noop vs the current target state."""
    t = target.select(
        *key_cols,
        F.struct(*[F.col(c).alias(c) for c in compare_cols]).alias("__t_vals"),
    )
    s_vals = F.struct(*[F.col(c).alias(c) for c in compare_cols])
    joined = batch.withColumn("__s_vals", s_vals).join(t, on=key_cols, how="left")
    return joined.withColumn(
        "action",
        F.when(F.col("__t_vals").isNull(), F.lit("created"))
        .when(F.col("__t_vals").eqNullSafe(F.col("__s_vals")), F.lit("noop"))
        .otherwise(F.lit("updated")),
    ).drop("__t_vals", "__s_vals")


def merge_with_precedence(
    primary: DataFrame,
    secondary: DataFrame,
    key_cols: list[str],
    primary_cols: list[str],
    secondary_cols: list[str],
    violation_col: str | None = None,
) -> DataFrame:
    """Keyed merge where primary's fields win when present (coalesce per column);
    rows existing only in secondary pass through (the reference's (None, cat) arm).

    Rows only in primary are the reference's hard-error arm
    (MergeConcepts.scala:29-33 — an authoritative concept with no catalogue
    counterpart "should never be recorded"): we keep them visible instead of
    crashing the stream, and when ``violation_col`` is set the output carries a
    boolean marking them so callers can count/quarantine the invariant breach
    rather than silently dropping it."""
    p = primary.select(
        *key_cols,
        F.lit(True).alias("__p_present"),
        *[F.col(c).alias(f"__p_{c}") for c in primary_cols],
    )
    s = secondary.select(*key_cols, F.lit(True).alias("__s_present"), *secondary_cols)
    joined = s.join(p, on=key_cols, how="full_outer")
    out_cols = [F.col(k) for k in key_cols]
    for c in primary_cols:
        if c in secondary_cols:
            out_cols.append(F.coalesce(F.col(f"__p_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(f"__p_{c}").alias(c))
    out_cols += [F.col(c) for c in secondary_cols if c not in primary_cols]
    if violation_col is not None:
        out_cols.append(
            (
                F.col("__p_present").isNotNull() & F.col("__s_present").isNull()
            ).alias(violation_col)
        )
    return joined.select(*out_cols)


def merge_precedence_violations(
    primary: DataFrame, secondary: DataFrame, key_cols: list[str]
) -> DataFrame:
    """The invariant-breach rows themselves (primary-only keys) — quarantine-style
    output for the arm the reference hard-errors on (MergeConcepts.scala:29-39)."""
    return primary.join(secondary.select(*key_cols), on=key_cols, how="left_anti")


def most_specific_type(types_col) -> F.Column:
    """The reference's specificity rule as one expression: drop generic types;
    if any specific remain take the first (document order); else Agent if present
    else Concept; null/empty input → null."""
    generic = F.array(*[F.lit(t) for t in GENERIC_TYPES])
    specific = F.filter(types_col, lambda t: ~F.array_contains(generic, t))
    return (
        F.when(F.size(F.coalesce(types_col, F.array())) == 0, F.lit(None).cast("string"))
        .when(F.size(specific) > 0, F.element_at(specific, 1))
        .when(F.array_contains(types_col, "Agent"), F.lit("Agent"))
        .otherwise(F.lit("Concept"))
    )


def set_union_agg(df: DataFrame, key_cols: list[str], array_col: str) -> DataFrame:
    """Accumulate an array column per key as a sorted distinct union — the painless
    append-fields script as a real aggregation (explode → collect_set → sort)."""
    return (
        df.select(*key_cols, F.explode_outer(array_col).alias("__v"))
        .groupBy(*key_cols)
        .agg(F.array_sort(F.collect_set("__v")).alias(array_col))
    )
