"""Change-feed source formats: parquet (default), NDJSON (optionally gzipped),
and CSV — one reader contract for batch replay and streaming tail.

The reference's bulk source is gzipped NDJSON (ref: ingestor line framing,
common/src/main/scala/weco/concepts/common/source/Scroll.scala:8-25; snapshot
source aggregator/sources/WorksSnapshotSource.scala:15-24). Spark reads both
framing and gunzip natively; the only engine work is schema application and the
CSV array-encoding shim (CSV cannot carry ``array<int>``, so ``tokens`` rides
as a JSON string column and is parsed back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from .generator import CHANGE_LOG_SCHEMA

FORMATS = ("parquet", "jsonl", "csv", "debezium")


def _csv_surface(schema: StructType) -> tuple[StructType, list[str]]:
    """CSV cannot hold arrays: array columns become string (JSON-encoded)."""
    fields, array_cols = [], []
    for f in schema.fields:
        if isinstance(f.dataType, ArrayType):
            fields.append(StructField(f.name, StringType(), True))
            array_cols.append(f.name)
        else:
            fields.append(f)
    return StructType(fields), array_cols


def read_change_feed(
    spark: SparkSession,
    path: str,
    feed_format: str = "parquet",
    schema: StructType | None = None,
    streaming: bool = False,
    options: dict[str, str] | None = None,
    toast_sentinel: str | None = None,
) -> DataFrame:
    """Read a landed change feed in any supported format, batch or streaming,
    returning rows in the canonical change-log schema. ``options`` pass through
    to the reader (e.g. ``maxFilesPerTrigger`` for streaming admission).
    ``toast_sentinel`` applies to the debezium format only (see
    :func:`parse_debezium` — pair it with a partial-mode pipeline)."""
    schema = schema or CHANGE_LOG_SCHEMA
    reader = spark.readStream if streaming else spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if feed_format == "parquet":
        return reader.schema(schema).parquet(path)
    if feed_format == "jsonl":
        # .json handles NDJSON line framing and .gz decompression natively
        return reader.schema(schema).json(path)
    if feed_format == "debezium":
        # landed Debezium topic dump: one JSON envelope per line. The row
        # schema is the canonical schema minus the envelope-carried columns
        # (lsn/op) and engine-internal extras (event_ts/batch_id)
        row_schema = StructType([
            f for f in schema.fields
            if f.name not in ("lsn", "op", "event_ts", "batch_id")
        ])
        raw = reader.text(path)
        return parse_debezium(raw, row_schema, toast_sentinel=toast_sentinel)
    if feed_format == "csv":
        surface, array_cols = _csv_surface(schema)
        df = reader.schema(surface).option("header", "true").csv(path)
        for c in array_cols:
            df = df.withColumn(c, F.from_json(F.col(c), schema[c].dataType))
        return df.select(*[f.name for f in schema.fields])
    raise ValueError(f"unknown feed format {feed_format!r}; supported: {FORMATS}")


def debezium_envelope_schema(row_schema: StructType) -> StructType:
    """The Debezium JSON envelope for a given row schema: payload.{op, before,
    after, ts_ms, source.lsn} — the de-facto wire format of log-based CDC
    (MySQL binlog / Postgres WAL connectors)."""
    from pyspark.sql.types import LongType

    return StructType([
        StructField("payload", StructType([
            StructField("op", StringType(), True),
            StructField("before", row_schema, True),
            StructField("after", row_schema, True),
            StructField("ts_ms", LongType(), True),
            StructField("source", StructType([
                StructField("lsn", LongType(), True),
            ]), True),
        ]), True),
    ])


def parse_debezium(
    df: DataFrame,
    row_schema: StructType,
    value_col: str = "value",
    toast_sentinel: str | None = None,
) -> DataFrame:
    """Debezium JSON envelopes → the engine's canonical change-log contract.

    Mapping (Debezium semantics → engine semantics):
      op 'c' (create) / 'r' (snapshot read) → 'I';  'u' → 'U';  'd' → 'D'
      row image = ``after`` for c/r/u, ``before`` for d (Debezium deletes
      carry the last row image in ``before`` — the engine's delete path only
      needs the key, op, and lsn; LWW tombstoning ignores delete payloads)
      lsn = payload.source.lsn — the binlog/WAL position IS the total order
      the engine's LWW requires; ts_ms is informational only

    Pure column expressions (from_json + field access, whole-stage codegen):
    identical on a batch read and a streaming tail, so a landed Debezium
    topic dump is a drop-in feed for replay AND run_stream. Unparseable or
    unknown-op lines surface with NULL op and fall to the validator's
    quarantine path instead of failing the job.

    ``toast_sentinel`` (e.g. Debezium's ``"__debezium_unavailable_value"``):
    Postgres does not re-emit unchanged TOASTed columns, so Debezium fills
    them with a sentinel string — the canonical real-world source of SPARSE
    after-images. String-typed fields equal to the sentinel become NULL
    ("no statement"), which is exactly what ``update_mode='partial'`` needs:
    the per-column registers keep the target's value. Without partial mode a
    sentinel-NULLed column would overwrite real data with NULL — pair this
    option with a partial-mode pipeline. (Non-string fields can't carry the
    sentinel in typed JSON; a sentinel there fails the field parse and
    degrades to the same NULL no-statement.)"""
    env = debezium_envelope_schema(row_schema)
    p = F.from_json(F.col(value_col), env).getField("payload")
    op = (
        F.when(p.getField("op").isin("c", "r"), F.lit("I"))
        .when(p.getField("op") == "u", F.lit("U"))
        .when(p.getField("op") == "d", F.lit("D"))
        .otherwise(F.lit(None).cast("string"))
    )
    row = F.when(p.getField("op") == "d", p.getField("before")).otherwise(
        p.getField("after")
    )

    def field(f):
        c = row.getField(f.name)
        if toast_sentinel is not None and isinstance(f.dataType, StringType):
            c = F.when(c == F.lit(toast_sentinel), F.lit(None)).otherwise(c)
        return c.alias(f.name)

    return df.select(
        p.getField("source").getField("lsn").alias("lsn"),
        op.alias("op"),
        *[field(f) for f in row_schema.fields],
    )


def to_debezium(
    changes: DataFrame,
    change_type_col: str = "change_type",
    lsn_col: str | None = None,
    ts_ms_col: str | None = None,
) -> DataFrame:
    """The inverse adapter: snapshot_diff output (``include_old=True``) →
    Debezium JSON envelopes, one ``value`` string per changed row — so any
    Debezium-speaking consumer can tail THIS lake's change feed. Mapping:
    insert→'c' (before NULL), update→'u' (before = old_* pre-image),
    delete→'d' (before = the from-side payload snapshot_diff already emits,
    after NULL). ``lsn_col``/``ts_ms_col`` populate source.lsn / ts_ms when
    the caller has them (e.g. the commit version as the fence order); both
    are optional and NULL otherwise. Round-trip fidelity with parse_debezium
    is pytest-pinned."""
    cols = changes.columns
    payload_cols = [
        c for c in cols
        if c != change_type_col and not c.startswith("old_")
        and c not in (lsn_col, ts_ms_col)
    ]
    old_map = {c: f"old_{c}" for c in payload_cols if f"old_{c}" in cols}
    ct = F.col(change_type_col)
    op = (
        F.when(ct == "insert", F.lit("c"))
        .when(ct == "update", F.lit("u"))
        .when(ct == "delete", F.lit("d"))
    )
    row = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    old_row = F.struct(*[
        F.col(old_map.get(c, c)).alias(c) for c in payload_cols
    ])
    before = (
        F.when(ct == "delete", row)
        .when(ct == "update", old_row if old_map else F.lit(None))
    )
    after = F.when(ct != "delete", row)
    lsn = F.col(lsn_col) if lsn_col else F.lit(None).cast("long")
    ts = F.col(ts_ms_col) if ts_ms_col else F.lit(None).cast("long")
    return changes.select(
        F.to_json(F.struct(F.struct(
            op.alias("op"),
            before.alias("before"),
            after.alias("after"),
            ts.alias("ts_ms"),
            F.struct(lsn.alias("lsn")).alias("source"),
        ).alias("payload"))).alias("value")
    )
