"""Lake-to-lake replication: keep a replica table converged to a primary by
shipping per-commit CDF diffs — never a full copy after bootstrap.

The replica is an ordinary CDC lake table; each primary commit's classified
diff becomes a change batch (insert/update → op 'U' with the post-image,
delete → op 'D') stamped with the PRIMARY VERSION as its LSN, merged with the
usual fence (``repl:<v>``). Consequences, all inherited from the merge
discipline rather than re-implemented:

- exactly-once: a crashed replicator resumes from its fence cursor; replays
  short-circuit; duplicate application is impossible.
- ordering: version-as-LSN is monotone per key across commits, so a replica
  that applies versions in order can never regress a key (and a stale
  re-delivery of an old span loses LWW against the replica's own memory).
- cost: O(changed buckets of the span) per refresh — a replica that fell N
  commits behind ships N diffs (or ONE telescoped span diff with
  ``coalesce=True`` — deltas telescope, same argument as lake/view.py).
- maintenance commits (compaction, rescale) on the primary diff to empty —
  the replica doesn't mirror physical layout, only logical state, and may be
  bucketed/compacted entirely differently (e.g. a read-optimized replica of
  a write-optimized primary).

The reference has no replication story at all (one ES cluster, re-bulk-load
to rebuild); this is the lake-native answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .diff import snapshot_diff
from .merge import merge_into
from .table import LakeTable

FENCE_PREFIX = "repl:"


class Replica:
    """A logical replica of a primary lake table, converged by CDF diffs."""

    def __init__(
        self,
        spark: SparkSession,
        primary: LakeTable,
        replica_path: str,
        num_buckets: int | None = None,
    ):
        self.spark = spark
        self.primary = primary
        m = primary.manifest()
        # logical schema only — the replica keeps its own hidden CDC columns
        visible = StructType(
            [f for f in m.schema.fields if not f.name.startswith("_")]
        )
        from .merge import HIDDEN_DELETED, HIDDEN_LSN
        from pyspark.sql.types import BooleanType, LongType, StructField

        physical = StructType(
            list(visible.fields)
            + [
                StructField(HIDDEN_LSN, LongType(), True),
                StructField(HIDDEN_DELETED, BooleanType(), True),
            ]
        )
        self.table = LakeTable.create(
            replica_path,
            physical,
            m.key_cols,
            num_buckets=num_buckets or m.num_buckets,
            if_not_exists=True,
        )

    def applied_version(self) -> int:
        best = 0
        for tok in self.table.manifest().fence_tokens:
            if tok.startswith(FENCE_PREFIX):
                try:
                    best = max(best, int(tok[len(FENCE_PREFIX):]))
                except ValueError:
                    continue
        return best

    def _apply_span(self, from_v: int, to_v: int) -> None:
        d = snapshot_diff(self.spark, self.primary, from_v, to_v)
        batch = d.withColumn(
            "op",
            F.when(F.col("change_type") == "delete", F.lit("D")).otherwise(
                F.lit("U")
            ),
        ).withColumn("__repl_lsn", F.lit(to_v).cast("long")).drop("change_type")
        merge_into(
            self.spark,
            self.table,
            batch,
            lsn_col="__repl_lsn",
            fence_token=f"{FENCE_PREFIX}{to_v}",
        )

    def refresh(
        self, up_to_version: int | None = None, coalesce: bool = False
    ) -> int:
        """Converge the replica to the primary (version-by-version, or one
        telescoped span diff with ``coalesce=True``). Returns versions
        applied."""
        target = (
            self.primary.current_version()
            if up_to_version is None
            else up_to_version
        )
        start = self.applied_version()
        if target <= start:
            return 0
        if coalesce:
            self._apply_span(start, target)
            return target - start
        for v in range(start + 1, target + 1):
            self._apply_span(v - 1, v)
        return target - start

    def read(self) -> DataFrame:
        """The replica's live logical rows."""
        from .merge import HIDDEN_DELETED

        df = self.table.read(self.spark)
        live = df.filter(~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)))
        return live.drop(*[c for c in df.columns if c.startswith("_")])
