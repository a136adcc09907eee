"""Temporal / point-in-time operators over a CDC change log.

The reference pipeline keeps only the LATEST state per key (idempotent upsert
into ES — ref: common/.../BulkUpdateFlow.scala:32-60) and answers "what was
true at time T" only by replaying a snapshot. A lake-native CDC engine can do
strictly better, because the change log itself is a total order per key:

- ``scd2_history``     — the full version history as a Type-2 slowly-changing
                         dimension (valid_from / valid_to / is_current), the
                         canonical warehouse shape for auditable CDC targets.
- ``asof_join``        — enrich any probe stream with the state that was
                         current AT its sequence point (point-in-time lookup
                         join), without a range-explosion join.
- ``sequence_gap_audit`` — WAL/binlog completeness check: find every missing
                         LSN range in a feed without a global single-partition
                         sort.

All three are pure DataFrame compositions (no Python rows, no UDFs) and are
verified against ANSI-SQL oracles at the driver gate (DuckDB window functions
and its native ASOF JOIN).

Scale notes are on each function — the common theme is that every shuffle is
keyed by the join/partition key and window passes share one Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    log: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    tombstone: str = "D",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log.

    Input: validated change events (one row per event; ``op_col`` in
    {insert/update/.../tombstone}; upserts fully replace the row's payload —
    the engine's MERGE semantics, lake/merge.py). Output: one row per VERSION
    — each contiguous span during which the key held one payload value:

    - ``valid_from``  — LSN of the event that opened the version
    - ``valid_to``    — LSN of the event that closed it (the next
                        state-changing event for the key), NULL if still open
    - ``is_current``  — valid_to IS NULL

    No-op transitions create no version: an upsert whose payload equals the
    key's current state, a tombstone for an absent/already-deleted key. A
    tombstone closes the current version without opening one (the gap between
    a delete and a re-insert is representable: no version covers it).

    Scale: two window passes, both partitioned by ``key_cols`` and ordered by
    ``lsn_col`` — the second runs over the filtered output of the first, so
    Catalyst plans ONE Exchange + one sort; per-key state is O(1) (lag/lead),
    never a per-key buffer. Skewed keys cost their event count in one task's
    sort, same bound as any per-key history operator.
    """
    w = Window.partitionBy(*key_cols).orderBy(lsn_col)
    st = F.struct(*[F.col(c) for c in payload_cols])
    prev_op = F.lag(F.col(op_col)).over(w)
    prev_st = F.lag(st).over(w)
    is_del = F.col(op_col) == tombstone
    noop = (
        # tombstone for a key that holds no state
        (is_del & (prev_op.isNull() | (prev_op == tombstone)))
        # upsert equal to the current state
        | (
            ~is_del
            & prev_op.isNotNull()
            & (prev_op != tombstone)
            & st.eqNullSafe(prev_st)
        )
    )
    transitions = (
        log.withColumn("__noop", noop)
        .filter(~F.col("__noop"))
        .drop("__noop")
    )
    # the lead pass reuses the SAME window spec — that identity is what lets
    # Catalyst satisfy it with the first pass's Exchange (plan-asserted)
    versions = transitions.withColumn(
        "valid_to", F.lead(F.col(lsn_col)).over(w)
    )
    return versions.filter(~(F.col(op_col) == tombstone)).select(
        *key_cols,
        *payload_cols,
        F.col(lsn_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    key_cols: list[str],
    probe_seq_col: str,
    state_seq_col: str,
    payload_cols: list[str],
    op_col: str | None = None,
    tombstone: str = "D",
) -> DataFrame:
    """Point-in-time (AS-OF) left join: attach to each probe row the state
    row with the greatest ``state_seq_col`` <= the probe's ``probe_seq_col``
    for the same key (inclusive, like DuckDB/kdb ASOF semantics).

    If ``op_col`` is given, a matched tombstone means the key was DELETED as
    of that point — the probe row survives with NULL state (including
    ``as_of_<state_seq_col>``), exactly as if no state had ever existed.

    Output: every probe column, plus ``payload_cols`` from the matched state
    row and ``as_of_<state_seq_col>`` (the matched state's sequence). Payload
    names must not collide with probe columns.

    Scale — why not a range join: ``probe.seq >= state.seq`` as a join
    predicate explodes to O(|probe| x |versions per key|) intermediate rows
    and plans as a broadcast-nested-loop at worst. This implementation is the
    union-and-carry formulation instead: tag both sides, union, and carry the
    last non-null state forward over a window partitioned by key and ordered
    by (seq, side). ONE shuffle keyed by ``key_cols``, O(1) window state,
    output exactly |probe| rows. This is the standard scalable as-of shape
    (same plan Flink's temporal join and Delta's MERGE-based SCD lookups
    lower to).
    """
    # Promote BOTH sequence columns to a common wider type — narrowing the
    # probe to the state's type would silently wrap out-of-range values and
    # sort them into the wrong window position (wrong match, no error).
    # Mixed int/float is REFUSED rather than promoted to double: a double is
    # exact only below 2^53, so bigint LSNs above that would collide and
    # match a neighboring (even future) state — same hazard the gap audit's
    # DIV comment documents. The caller must pick the comparison domain.
    _int_rank = ["tinyint", "smallint", "int", "bigint"]
    _flt_rank = ["float", "double"]
    s_t = dict(state.dtypes)[state_seq_col]
    p_t = dict(probe.dtypes)[probe_seq_col]
    if s_t == p_t:
        seq_t = s_t
    elif s_t in _int_rank and p_t in _int_rank:
        seq_t = max(s_t, p_t, key=_int_rank.index)
    elif s_t in _flt_rank and p_t in _flt_rank:
        seq_t = "double"
    else:
        raise ValueError(
            f"asof_join sequence columns have incomparable types "
            f"{p_t!r} (probe) vs {s_t!r} (state) — cast one side explicitly "
            "(mixed int/float is refused: double is exact only below 2^53)"
        )
    st_fields = [F.col(c) for c in payload_cols] + [
        F.col(state_seq_col).alias("__seq_val")
    ]
    if op_col is not None:
        st_fields.append(F.col(op_col).alias("__op"))
    s = state.select(
        *key_cols,
        F.col(state_seq_col).cast(seq_t).alias("__seq"),
        F.lit(0).alias("__side"),
        F.struct(*st_fields).alias("__st"),
    )
    st_type = s.schema["__st"].dataType
    probe_rest = [c for c in probe.columns if c not in key_cols]
    p = probe.select(
        *key_cols,
        F.col(probe_seq_col).cast(seq_t).alias("__seq"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(st_type).alias("__st"),
        *probe_rest,
    )
    s_full = s
    for c in probe_rest:
        s_full = s_full.withColumn(c, F.lit(None).cast(dict(probe.dtypes)[c]))
    u = s_full.unionByName(p)
    # state rows (side=0) sort before probe rows at equal seq => inclusive <=
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__seq", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__cur", F.last("__st", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    cur = F.col("__cur")
    if op_col is not None:
        cur = F.when(F.col("__cur.__op") != tombstone, F.col("__cur"))
    out = out.withColumn("__m", cur)
    return out.select(
        *key_cols,
        *probe_rest,
        *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
        F.col("__m.__seq_val").alias(f"as_of_{state_seq_col}"),
    )


def sequence_gap_audit(
    feed: DataFrame,
    seq_col: str,
    block_size: int = 1 << 16,
) -> DataFrame:
    """Find every missing range in a sequence column — the WAL/binlog
    completeness audit a CDC consumer runs before trusting a replay
    (the engine's analogue of checking SQS delivery against the catalogue
    snapshot inventory, ref: aggregator/README.md bulk-vs-SQS duality).

    Returns one row per maximal gap: (gap_start, gap_end, missing), where
    gap_start..gap_end is the inclusive run of absent sequence values between
    two observed ones. Duplicates in the feed are tolerated (audited
    elsewhere); the leading edge before min(seq) is not a gap (no anchor).

    Scale — why not one window over all LSNs: a global ``ORDER BY seq``
    window is a single-partition sort of the whole feed. Instead, sequence
    values group into fixed blocks of ``block_size`` consecutive values:

    Memory bound: a DENSE block materializes one sorted array of up to
    ``block_size`` longs inside a single aggregation buffer — 2^16 (default)
    is ~512 KB worst-case per group, trivially safe; raise it only to shrink
    the block-summary side (10^10 LSNs / 2^16 ≈ 153k summary rows — still one
    light task for the cross-block lag window).

    1. per-block (hash-distributed groupBy, map-side partial): the distinct
       seqs collapse to a sorted array bounded by block_size, from which
       intra-block gaps fall out with one higher-order-function pass;
    2. cross-block gaps come from a lag window over the per-block summary —
       10^10 LSNs / 2^20 block => ~10^4 summary rows, trivially one task.

    Heavy work is O(feed) fully parallel; the only serial step is over
    blocks, not rows.
    """
    seq = F.col(seq_col)
    # integer DIV, not floor(a/b): double division is only exact below 2^53
    blk = F.expr(f"CAST(__seq DIV {int(block_size)} AS BIGINT)").alias("__blk")
    per_block = (
        feed.select(seq.alias("__seq"))
        .select("__seq", blk)
        .groupBy("__blk")
        .agg(
            F.array_sort(F.collect_set("__seq")).alias("__seqs"),
            F.min("__seq").alias("__lo"),
            F.max("__seq").alias("__hi"),
        )
    )
    # intra-block gaps: adjacent distinct values more than 1 apart
    idx = F.sequence(F.lit(0), F.size("__seqs") - 2)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            (F.element_at(F.col("__seqs"), i + 1) + 1).alias("gap_start"),
            (F.element_at(F.col("__seqs"), i + 2) - 1).alias("gap_end"),
        ),
    )
    intra = (
        per_block.filter(F.size("__seqs") >= 2)
        .select(
            F.explode(
                F.filter(pairs, lambda g: g["gap_start"] <= g["gap_end"])
            ).alias("g")
        )
        .select(F.col("g.gap_start"), F.col("g.gap_end"))
    )
    # cross-block gaps: between one block's max and the next present block's
    # min (also covers entirely-missing blocks in between)
    wb = Window.orderBy("__blk")
    cross = (
        per_block.select("__blk", "__lo", "__hi")
        .withColumn("__prev_hi", F.lag("__hi").over(wb))
        .filter(
            F.col("__prev_hi").isNotNull()
            & (F.col("__lo") > F.col("__prev_hi") + 1)
        )
        .select(
            (F.col("__prev_hi") + 1).alias("gap_start"),
            (F.col("__lo") - 1).alias("gap_end"),
        )
    )
    out = intra.unionByName(cross)
    return out.select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("missing"),
    )
