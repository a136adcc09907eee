"""Inverted token index — a secondary index over the CDC target's token
arrays, maintained incrementally from the base table's commit history.

"Which documents contain token t?" is unanswerable at 100 TB without an
index: the token arrays are the dominant bytes and a predicate scan decodes
all of them. This module maintains the classic inverted-file answer as a lake
table of SHARDED POSTING LISTS:

    (token int, shard int, doc_ids array<string>)   keyed by (token, shard)

- ``shard = xxhash64(doc_id) % num_shards`` bounds every posting row: a token
  that appears in 10^9 documents becomes ``num_shards`` rows of ~10^9/shards
  ids each, never one unbounded row — and posting updates for one commit
  spread across shards/buckets instead of hammering one key.
- Maintenance is CDF-driven (same discipline as lake/view.py): per base
  commit, diff with pre-images → exploded (token, doc_id) pairs → adds =
  new∖old, dels = old∖new → ONE fenced merge in ``array_patch`` mode
  (posting := sort(except(union(current, adds), dels))). The fence cursor
  makes refresh resumable and exactly-once; maintenance commits fold as empty
  diffs. Cost per commit: O(changed docs × tokens/doc), never a base re-scan.
- Lookup is the engine's own stat-pruned point read: the ``num_shards`` keys
  (token, 0..shards-1) bucket-prune to a handful of files; no scan of the
  index, let alone the base.

The reference has exactly one index shape (ES's own inverted index, built by
the store); here the ENGINE owns the index as a derived table with the same
exactly-once/lineage guarantees as any other target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .diff import snapshot_diff
from .merge import merge_into, read_for_keys
from .table import LakeTable

FENCE_PREFIX = "tix:"


class TokenIndex:
    """Sharded inverted index over an ``array`` column of a CDC lake table."""

    def __init__(
        self,
        spark: SparkSession,
        base: LakeTable,
        index_path: str,
        tokens_col: str = "tokens",
        doc_col: str = "doc_id",
        num_shards: int = 16,
        num_buckets: int = 16,
    ):
        self.spark = spark
        self.base = base
        self.tokens_col = tokens_col
        self.doc_col = doc_col
        schema = StructType(
            [
                StructField("token", IntegerType(), False),
                StructField("shard", IntegerType(), False),
                StructField("doc_ids", ArrayType(StringType()), True),
            ]
        )
        self.table = LakeTable.create(
            index_path, schema, ["token", "shard"],
            num_buckets=num_buckets, if_not_exists=True,
            properties={
                "num_shards": num_shards,
                "tokens_col": tokens_col,
                "doc_col": doc_col,
            },
        )
        # shard count is a PHYSICAL property of the stored postings: reopening
        # with a different count would route deletes to the wrong shard row
        # and leave stale pairs behind — always adopt the stored value
        props = self.table.manifest().properties or {}
        stored = props.get("num_shards")
        self.num_shards = int(stored) if stored is not None else num_shards
        # the indexed columns are LOGICAL spec: folding diffs of a different
        # column into existing postings silently corrupts the index — refuse
        for prop, want in (("tokens_col", tokens_col), ("doc_col", doc_col)):
            have = props.get(prop)
            if have is not None and have != want:
                raise ValueError(
                    f"index at {index_path} was created over {prop}={have!r}, "
                    f"reopened with {want!r} — refusing to fold mismatched diffs"
                )

    # ------------------------------------------------------------------

    def _shard(self, doc):
        return F.pmod(F.xxhash64(doc), F.lit(self.num_shards)).cast("int")

    def applied_version(self) -> int:
        from .table import fence_cursor

        return fence_cursor(self.table, FENCE_PREFIX)

    def _pairs(self, d: DataFrame, tokens_col: str) -> DataFrame:
        """Distinct (token, doc_id) pairs from a diff side."""
        return (
            d.select(
                F.explode(F.col(tokens_col)).alias("__tok"),
                F.col(self.doc_col).alias("doc_id"),
            )
            .select(F.col("__tok").cast("int").alias("token"), "doc_id")
            .distinct()
        )

    def refresh(self, up_to_version: int | None = None) -> int:
        """Fold every unapplied base commit into the index — one diff + one
        fenced array_patch merge per version (resumable, exactly-once)."""
        target = (
            self.base.current_version()
            if up_to_version is None
            else up_to_version
        )
        applied = 0
        for v in range(self.applied_version() + 1, target + 1):
            # adds/dels each consume BOTH pair sets, and the merge's bucket
            # discovery materializes the patch a second time — persist the
            # diff and the pair sets so the diff subtree runs once, not 4x
            d = snapshot_diff(
                self.spark, self.base, v - 1, v, include_old=True
            ).persist()
            new_pairs = self._pairs(
                d.filter(F.col("change_type") != "delete"), self.tokens_col
            ).persist()
            old_pairs = self._pairs(
                d.filter(F.col("change_type") != "insert"),
                f"old_{self.tokens_col}",
            ).persist()
            try:
                adds = new_pairs.subtract(old_pairs)
                dels = old_pairs.subtract(new_pairs)
                patch = (
                    adds.withColumn("__w", F.lit(1))
                    .unionByName(dels.withColumn("__w", F.lit(-1)))
                    .groupBy(
                        "token", self._shard(F.col("doc_id")).alias("shard")
                    )
                    .agg(
                        F.sort_array(
                            F.collect_set(
                                F.when(F.col("__w") > 0, F.col("doc_id"))
                            )
                        ).alias("add_ids"),
                        F.sort_array(
                            F.collect_set(
                                F.when(F.col("__w") < 0, F.col("doc_id"))
                            )
                        ).alias("del_ids"),
                    )
                    .withColumn("op", F.lit("U"))
                )
                stats = merge_into(
                    self.spark,
                    self.table,
                    patch,
                    update_mode="array_patch",
                    patch_cols={"doc_ids": ("add_ids", "del_ids")},
                    fence_token=f"{FENCE_PREFIX}{v}",
                )
            finally:
                for df in (new_pairs, old_pairs, d):
                    df.unpersist(blocking=False)
            if not stats.skipped:
                applied += 1
        return applied

    def lookup(self, tokens: list[int]) -> DataFrame:
        """(token, doc_id) rows for the probed tokens — a bucket+stat-pruned
        point read of num_shards keys per token, no scan."""
        keys = [(int(t), s) for t in tokens for s in range(self.num_shards)]
        got = read_for_keys(self.spark, self.table, keys)
        return got.filter(F.size("doc_ids") > 0).select(
            "token", F.explode("doc_ids").alias("doc_id")
        )

    def read_all(self) -> DataFrame:
        """The full index content as (token, doc_id) rows (gate/test surface)."""
        return (
            self.table.read(self.spark)
            .filter(F.size("doc_ids") > 0)
            .select("token", F.explode("doc_ids").alias("doc_id"))
        )

    def recompute(self) -> DataFrame:
        """Declarative spec: distinct (token, doc_id) over the base's live
        rows (MoR-resolving reader)."""
        from .diff import read_live

        m = self.base.manifest()
        live = read_live(self.spark, self.base, m, {f.bucket for f in m.files})
        return self._pairs(live, self.tokens_col)
