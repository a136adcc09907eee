"""IncrementalAggView: exactly-once resumable delta refresh of a downstream
aggregate, equal to full recompute at every step — including across
group-moving updates, deletes, compaction no-op commits, and a crash-resume
(partial refresh then continue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc.apply import CdcPipeline
from concepts_pipeline_spark.lake.merge import compact
from concepts_pipeline_spark.lake.view import IncrementalAggView
from tests.test_lake_table import TOKENS_SCHEMA


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, lsn long, op string, tokens array<int>, "
        "n_tok int, source string",
    )


def _pipe(spark, tmp_path, name="t", **kw):
    return CdcPipeline(
        spark, str(tmp_path / name), TOKENS_SCHEMA, ["doc_id"],
        num_buckets=4, salt_buckets=2, **kw,
    )


def _view(spark, pipe, tmp_path, name="v"):
    return IncrementalAggView(
        spark, pipe.target, str(tmp_path / name),
        group_cols=["source"], sum_cols={"tok_sum": "n_tok"},
    )


def as_map(df):
    return {
        r["source"]: (r["n_rows"], r["tok_sum"]) for r in df.collect()
    }


def test_view_tracks_inserts_updates_deletes_and_group_moves(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    pipe.apply_batch(
        _batch(spark, [
            ("a", 1, "I", [1, 2], 2, "web"),
            ("b", 2, "I", [3], 1, "web"),
            ("c", 3, "I", [4, 5, 6], 3, "book"),
        ]),
        fence_token="b0",
    )
    pipe.apply_batch(
        _batch(spark, [
            ("a", 10, "U", [9, 9, 9], 3, "book"),  # moves web -> book
            ("b", 11, "D", None, None, None),      # delete from web
            ("d", 12, "I", [7], 1, "web"),
        ]),
        fence_token="b1",
    )
    view = _view(spark, pipe, tmp_path)
    assert view.refresh() == view.applied_version() == 2
    got = as_map(view.read())
    assert got == {"web": (1, 1), "book": (2, 6)}
    # the exactness bar: incremental == recompute
    assert got == as_map(view.recompute())
    # idempotent: nothing new to fold
    assert view.refresh() == 0
    assert as_map(view.read()) == got


def test_view_refresh_is_resumable_and_skips_maintenance_commits(
    spark, tmp_path
):
    pipe = _pipe(spark, tmp_path, strategy="mor")
    for i in range(3):
        pipe.apply_batch(
            _batch(spark, [
                (f"k{i}", 100 + i, "I", [i], 1, f"s{i % 2}"),
            ]),
            fence_token=f"m{i}",
        )
    compact(spark, pipe.target, max_delta_files_per_bucket=0)  # +1 version
    view = _view(spark, pipe, tmp_path)
    # crash-resume: fold only the first two commits, then continue
    assert view.refresh(up_to_version=2) == 2
    mid = as_map(view.read())
    assert mid == {"s0": (1, 1), "s1": (1, 1)}
    # resumes from fence state; the compaction commit folds as an empty diff
    assert view.refresh() == 2
    assert as_map(view.read()) == as_map(view.recompute()) == {
        "s0": (2, 2), "s1": (1, 1),
    }


def test_view_zero_rows_group_hidden(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    pipe.apply_batch(
        _batch(spark, [("a", 1, "I", [1], 1, "web")]), fence_token="z0"
    )
    pipe.apply_batch(
        _batch(spark, [("a", 2, "D", None, None, None)]), fence_token="z1"
    )
    view = _view(spark, pipe, tmp_path)
    view.refresh()
    assert as_map(view.read()) == {}
    assert view.table.read(spark).count() == 1  # zero row retained internally
