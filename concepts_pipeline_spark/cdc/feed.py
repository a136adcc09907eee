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

FORMATS = ("parquet", "jsonl", "csv")


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
) -> DataFrame:
    """Read a landed change feed in any supported format, batch or streaming,
    returning rows in the canonical change-log schema. ``options`` pass through
    to the reader (e.g. ``maxFilesPerTrigger`` for streaming admission)."""
    schema = schema or CHANGE_LOG_SCHEMA
    reader = spark.readStream if streaming else spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if feed_format == "parquet":
        return reader.schema(schema).parquet(path)
    if feed_format == "jsonl":
        # .json handles NDJSON line framing and .gz decompression natively
        return reader.schema(schema).json(path)
    if feed_format == "csv":
        surface, array_cols = _csv_surface(schema)
        df = reader.schema(surface).option("header", "true").csv(path)
        for c in array_cols:
            df = df.withColumn(c, F.from_json(F.col(c), schema[c].dataType))
        return df.select(*[f.name for f in schema.fields])
    raise ValueError(f"unknown feed format {feed_format!r}; supported: {FORMATS}")
