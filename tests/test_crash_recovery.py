"""Exactly-once under partial failure: a crash BETWEEN the quarantine commit and
the target commit must not duplicate quarantine rows, lose events, or double-
apply on retry — the fence tokens of the two tables recover independently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import concepts_pipeline_spark.cdc.apply as apply_mod
from concepts_pipeline_spark.cdc.apply import CdcPipeline
from concepts_pipeline_spark.cdc.derive import derived_change_log

SF = "/root/testdata/sf0.001"


class Boom(RuntimeError):
    pass


def make_pipe(spark, tmp_path):
    from __spark_entry__ import TOKENS_SCHEMA

    return CdcPipeline(
        spark,
        target_path=str(tmp_path / "t"),
        target_schema=TOKENS_SCHEMA,
        key_cols=["doc_id"],
        quarantine_path=str(tmp_path / "q"),
        lineage_path=str(tmp_path / "l"),
        num_buckets=4,
    )


def test_crash_between_quarantine_and_target_commit(spark, tmp_path, monkeypatch):
    log = derived_change_log(spark, SF)
    pipe = make_pipe(spark, tmp_path)
    b0 = log.filter(F.pmod(F.col("lsn"), F.lit(2)) == 0)
    b1 = log.filter(F.pmod(F.col("lsn"), F.lit(2)) == 1)
    pipe.apply_batch(b0, fence_token="c:0")

    # crash after the quarantine write, before the target merge
    real_merge = apply_mod.merge_into

    def exploding_merge(*a, **k):
        raise Boom("crash before target commit")

    monkeypatch.setattr(apply_mod, "merge_into", exploding_merge)
    with pytest.raises(Boom):
        pipe.apply_batch(b1, fence_token="c:1")
    monkeypatch.setattr(apply_mod, "merge_into", real_merge)

    # quarantine batch-1 commit landed, target did not
    assert pipe.quarantine.has_fence_token("c:1:q")
    assert not pipe.target.has_fence_token("c:1")
    q_rows_mid = pipe.quarantine.read(spark).count()

    # retry the same batch: target applies, quarantine append is a fenced no-op
    res = pipe.apply_batch(b1, fence_token="c:1")
    assert not res.stats.skipped
    assert res.quarantined > 0  # recomputed via the recovery count path
    assert pipe.quarantine.read(spark).count() == q_rows_mid  # no duplicates
    assert pipe.target.has_fence_token("c:1")

    # final state equals the crash-free replay
    clean = make_pipe(spark, tmp_path / "clean")
    clean.apply_batch(b0, fence_token="c:0")
    clean.apply_batch(b1, fence_token="c:1")

    def snap(p):
        return {
            (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
            for r in p.final_state().collect()
        }

    assert snap(pipe) == snap(clean)

    # lineage recorded the retried batch exactly once
    lin = pipe.lineage.read(spark)
    assert lin.filter(F.col("fence_token") == "c:1").count() >= 1
    assert (
        lin.groupBy("fence_token", "bucket").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_crash_between_target_commit_and_lineage(spark, tmp_path, monkeypatch):
    """Crash AFTER the target commit but BEFORE the lineage append: the fenced
    retry must close the lineage hole with a recovery marker, exactly once."""
    log = derived_change_log(spark, SF)
    pipe = make_pipe(spark, tmp_path)
    from concepts_pipeline_spark.lake.table import LakeTable

    real_append_rows = LakeTable.append_rows
    boom = {"armed": True}

    def exploding_append_rows(self, rows, fence_token=None):
        if boom["armed"]:
            boom["armed"] = False
            raise Boom("crash before lineage append")
        return real_append_rows(self, rows, fence_token=fence_token)

    monkeypatch.setattr(LakeTable, "append_rows", exploding_append_rows)
    with pytest.raises(Boom):
        pipe.apply_batch(log, fence_token="lh:0")
    # target committed, lineage did not
    assert pipe.target.has_fence_token("lh:0")
    assert not pipe.lineage.has_fence_token("lh:0:l")

    res = pipe.apply_batch(log, fence_token="lh:0")  # fenced retry
    assert res.stats.skipped
    assert pipe.lineage.has_fence_token("lh:0:l")
    lin = pipe.lineage.read(spark).filter(F.col("fence_token") == "lh:0")
    assert lin.count() == 1  # the recovery marker, exactly once

    # a second retry does not duplicate it
    pipe.apply_batch(log, fence_token="lh:0")
    assert pipe.lineage.read(spark).filter(F.col("fence_token") == "lh:0").count() == 1
