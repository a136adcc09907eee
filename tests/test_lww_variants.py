"""The three LWW formulations (max_by agg, window, applyInPandas) must agree,
and the Arrow token-validation UDF must agree with the expression validator."""

from __future__ import annotations

from pyspark.sql import functions as F

from concepts_pipeline_spark.cdc.apply import (
    make_validate_tokens_udf,
    valid_event_expr,
)
from concepts_pipeline_spark.cdc.derive import derived_change_log
from concepts_pipeline_spark.operators.lww import lww_latest

SF = "/root/testdata/sf0.001"


def winners(df):
    return {
        r["doc_id"]: (r["lsn"], r["op"], tuple(r["tokens"] or []), r["n_tok"])
        for r in df.collect()
    }


def test_lww_methods_agree(spark):
    log = derived_change_log(spark, SF)
    agg = winners(lww_latest(log, ["doc_id"], method="agg"))
    win = winners(lww_latest(log, ["doc_id"], method="window"))
    win_salted = winners(
        lww_latest(log, ["doc_id"], method="window", salt_buckets=4)
    )
    pdn = winners(lww_latest(log, ["doc_id"], method="pandas"))
    assert agg == win == win_salted == pdn


def test_same_lsn_delete_outranks_upsert_all_methods(spark):
    schema = ("lsn long, op string, doc_id string, tokens array<int>, "
              "n_tok int, source string")
    rows = [(5, "U", "k", [1], 1, "s"), (5, "D", "k", None, None, "s"),
            (3, "U", "k", [9], 1, "s")]
    df = spark.createDataFrame(rows, schema)
    for method in ("agg", "window", "pandas"):
        out = lww_latest(df, ["doc_id"], method=method).collect()
        assert len(out) == 1 and out[0]["op"] == "D", method


def test_arrow_udf_validation_agrees_with_expression(spark):
    log = derived_change_log(spark, SF).filter(F.col("op") != "D")
    expr_valid = log.withColumn(
        "ok", valid_event_expr().isNull()
    ).select("lsn", "ok")
    udf_valid = log.withColumn(
        "ok", make_validate_tokens_udf()(F.col("tokens"), F.col("n_tok"))
    ).select("lsn", "ok")
    e = {r["lsn"]: r["ok"] for r in expr_valid.collect()}
    u = {r["lsn"]: r["ok"] for r in udf_valid.collect()}
    assert e == u
