"""Optimistic-concurrency retry: a losing manifest swap re-runs the merge
against the winner's snapshot and still applies exactly once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concepts_pipeline_spark.lake import LakeTable, merge_into
from concepts_pipeline_spark.lake.table import CommitConflict, Manifest

SCHEMA_DDL = "doc_id string, v int"


def make_table(spark, tmp_path):
    from pyspark.sql.types import StructType

    return LakeTable.create(
        str(tmp_path / "t"), StructType.fromDDL(SCHEMA_DDL), ["doc_id"], num_buckets=2
    )


def src(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_DDL + ", op string")


def test_conflict_retry_applies_once(spark, tmp_path, monkeypatch):
    t = make_table(spark, tmp_path)
    merge_into(spark, t, src(spark, [("a", 1, "U")]), fence_token="m:0")

    # sabotage: just before our commit lands, a "racing writer" bumps the
    # version so the first attempt hits CommitConflict
    real_write = LakeTable._write_manifest
    fired = {"n": 0}

    def racing_write(self, m: Manifest, base=None):
        if fired["n"] == 0:
            fired["n"] += 1
            racer = self.manifest()
            bumped = Manifest.from_json(racer.to_json())
            bumped.version = racer.version + 1
            bumped.fence_tokens = racer.fence_tokens + ["racer:x"]
            real_write(self, bumped)  # the racer wins this version
        return real_write(self, m, base=base)

    monkeypatch.setattr(LakeTable, "_write_manifest", racing_write)
    stats = merge_into(spark, t, src(spark, [("a", 2, "U"), ("b", 9, "U")]),
                       fence_token="m:1")
    monkeypatch.undo()

    assert fired["n"] == 1  # conflict actually happened
    assert stats.updated == 1 and stats.inserted == 1
    got = {r["doc_id"]: r["v"] for r in t.read(spark).collect()}
    assert got == {"a": 2, "b": 9}
    # both the racer's and our fence survive in the final lineage
    assert t.has_fence_token("m:1") and t.has_fence_token("racer:x")


def test_conflict_exhausts_retries(spark, tmp_path, monkeypatch):
    t = make_table(spark, tmp_path)

    def always_conflict(self, m, base=None):
        raise CommitConflict("busy")

    monkeypatch.setattr(LakeTable, "_write_manifest", always_conflict)
    with pytest.raises(CommitConflict):
        merge_into(spark, t, src(spark, [("a", 1, "U")]),
                   fence_token="m:0", max_retries=1)
