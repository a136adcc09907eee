"""Snapshot expiry / orphan-file vacuum, and schema evolution under merge-on-read."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from concepts_pipeline_spark.cdc.apply import CdcPipeline
from concepts_pipeline_spark.lake import LakeTable

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)

LOG = ("lsn long, op string, doc_id string, tokens array<int>, "
       "n_tok int, source string")


def test_expire_snapshots_keeps_state_and_removes_orphans(spark, tmp_path):
    pipe = CdcPipeline(
        spark, str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=2,
    )
    for i in range(4):
        b = spark.createDataFrame(
            [(10 * i + j, "I" if i == 0 else "U", f"d{j}", [i, j], 2, "s")
             for j in range(3)],
            LOG,
        )
        pipe.apply_batch(b, fence_token=f"e:{i}")
    t = pipe.target
    versions_before = t._manifest_versions()
    files_before = len(
        [f for f in os.listdir(os.path.join(t.path, "data")) if f.endswith(".parquet")]
    )
    def snap(df):
        return {(r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
                for r in df.collect()}

    state_before = snap(pipe.final_state())

    dropped_manifests, dropped_files = t.expire_snapshots(keep_last=2)
    assert dropped_manifests == len(versions_before) - 2
    assert dropped_files > 0
    files_after = len(
        [f for f in os.listdir(os.path.join(t.path, "data")) if f.endswith(".parquet")]
    )
    assert files_after == files_before - dropped_files

    # current state unchanged; fence history survives; time travel within window
    assert snap(pipe.final_state()) == state_before
    assert t.has_fence_token("e:0")
    assert len(t._manifest_versions()) == 2
    t.read(spark, version=t._manifest_versions()[0]).collect()  # older kept snapshot

    # idempotent
    assert t.expire_snapshots(keep_last=2) == (0, 0)

    # and new commits still apply cleanly after expiry
    b = spark.createDataFrame([(100, "U", "d0", [9], 1, "s")], LOG)
    pipe.apply_batch(b, fence_token="e:5")
    got = {r["doc_id"]: tuple(r["tokens"]) for r in pipe.final_state().collect()}
    assert got["d0"] == (9,)


def test_mor_schema_evolution(spark, tmp_path):
    pipe = CdcPipeline(
        spark, str(tmp_path / "m"), SCHEMA, ["doc_id"], num_buckets=2,
        strategy="mor",
    )
    b1 = spark.createDataFrame([(1, "I", "a", [1], 1, "s"), (2, "I", "b", [2], 1, "s")], LOG)
    pipe.apply_batch(b1, fence_token="m:1")
    b2 = (
        spark.createDataFrame([(10, "U", "a", [5], 1, "s")], LOG)
        .withColumn("n_tok", F.col("n_tok").cast("long"))
        .withColumn("lang", F.lit("en"))
    )
    pipe.apply_batch(b2, fence_token="m:2")
    got = {r["doc_id"]: r.asDict() for r in pipe.final_state().collect()}
    assert got["a"]["lang"] == "en" and got["a"]["tokens"] == [5]
    assert got["b"]["lang"] is None and got["b"]["n_tok"] == 1
    assert dict(pipe.final_state().dtypes)["n_tok"] == "bigint"  # widened


def test_orphan_scan_reclaims_unreferenced_files(spark, tmp_path):
    """Files written by losing/crashed commit attempts appear in NO manifest;
    the orphan scan must reclaim them once past the age grace, and must leave
    recent (possibly in-flight) files alone."""
    import time

    pipe = CdcPipeline(spark, str(tmp_path / "t"), SCHEMA, ["doc_id"], num_buckets=2)
    b = spark.createDataFrame([(1, "I", "a", [1, 2], 2, "s")], LOG)
    pipe.apply_batch(b, fence_token="o:1")
    t = pipe.target
    data = os.path.join(t.path, "data")

    old_orphan = os.path.join(data, "deadbeef0000-b00000-0000.parquet")
    new_orphan = os.path.join(data, "deadbeef0001-b00000-0000.parquet")
    for p in (old_orphan, new_orphan):
        with open(p, "wb") as fh:
            fh.write(b"PAR1")
    past = time.time() - 7200
    os.utime(old_orphan, (past, past))

    _, removed = t.expire_snapshots(keep_last=1, orphan_grace_seconds=3600)
    assert not os.path.exists(old_orphan)  # past grace: reclaimed
    assert os.path.exists(new_orphan)      # inside grace: kept
    assert removed >= 1
    # table still reads fine
    assert pipe.final_state().count() == 1
    os.unlink(new_orphan)


def test_read_for_keys_numeric_key_not_string_pruned(spark, tmp_path):
    """Regression: numeric keys must not be pruned by lexicographic string
    min/max stats (key 100 vs file stats ['99','101'] would be dropped)."""
    from pyspark.sql.types import LongType, StructField as SF, StructType as ST

    from concepts_pipeline_spark.lake import LakeTable
    from concepts_pipeline_spark.lake.merge import read_for_keys

    schema = ST([SF("k", LongType(), False), SF("v", StringType(), True)])
    t = LakeTable.create(str(tmp_path / "num"), schema, ["k"], num_buckets=1)
    t.append(spark.createDataFrame([(99, "a"), (100, "b"), (101, "c")], schema))
    got = {r["k"]: r["v"] for r in read_for_keys(spark, t, [100]).collect()}
    assert got == {100: "b"}


def test_read_for_keys_composite_keys(spark, tmp_path):
    """Composite-key lookups probe buckets over the FULL key tuple; scalar
    probes (which would hash a key prefix to the wrong bucket) are rejected."""
    import pytest
    from pyspark.sql.types import StructField as SF, StructType as ST

    from concepts_pipeline_spark.lake import LakeTable
    from concepts_pipeline_spark.lake.merge import read_for_keys

    schema = ST([SF("a", StringType(), False), SF("b", StringType(), False),
                 SF("v", StringType(), True)])
    t = LakeTable.create(str(tmp_path / "comp"), schema, ["a", "b"], num_buckets=4)
    t.append(spark.createDataFrame(
        [("x", "y", "1"), ("x", "z", "2"), ("w", "y", "3")], schema
    ))
    got = {(r["a"], r["b"]): r["v"]
           for r in read_for_keys(spark, t, [("x", "y"), ("w", "y"), ("q", "q")]).collect()}
    assert got == {("x", "y"): "1", ("w", "y"): "3"}
    with pytest.raises(ValueError, match="full key tuples"):
        read_for_keys(spark, t, ["x"])


def test_read_for_keys_numeric_stats_prune_files(spark, tmp_path, monkeypatch):
    """Native-typed min/max stats make numeric keys range-prunable: a lookup
    reads only the file whose [min,max] covers the key."""
    from pyspark.sql.types import LongType, StructField as SF, StructType as ST

    from concepts_pipeline_spark.lake import LakeTable
    from concepts_pipeline_spark.lake.merge import read_for_keys

    schema = ST([SF("k", LongType(), False), SF("v", StringType(), True)])
    t = LakeTable.create(str(tmp_path / "numstat"), schema, ["k"], num_buckets=1)
    for lo in (0, 100, 200):  # three files with disjoint key ranges
        t.append(spark.createDataFrame(
            [(lo + i, f"v{lo + i}") for i in range(10)], schema
        ))
    files = t.manifest().files
    assert all(isinstance(f.min_key, int) for f in files), files

    seen = {}
    real = LakeTable._read_files

    # capture the pruned file list without disturbing behavior
    def spy2(self, spark_, m, files_arg):
        seen["files"] = list(files_arg)
        return real(self, spark_, m, files_arg)

    monkeypatch.setattr(LakeTable, "_read_files", spy2)
    got = {r["k"]: r["v"] for r in read_for_keys(spark, t, [105, 107]).collect()}
    assert got == {105: "v105", 107: "v107"}
    assert len(seen["files"]) == 1  # only the 100-109 file was scanned
    assert seen["files"][0].min_key == 100
