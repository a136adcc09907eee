"""Ingestor bulk-path test: gzipped NDJSON authority dump → line source →
SKOS transform → -781 filter → idempotent merge (ref: the ingestor stream,
ingestor/IngestStream.scala:43-54; gzip line framing: common/.../source/
Scroll.scala:8-25 — spark.read.text handles both natively)."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

from concepts_pipeline_spark.lake import LakeTable, merge_into
from concepts_pipeline_spark.operators.skos import (
    filter_geographic_subdivisions,
    skos_transform,
)

CONCEPTS_SCHEMA = StructType(
    [
        StructField("authority", StringType(), False),
        StructField("identifier", StringType(), False),
        StructField("label", StringType(), True),
        StructField("alternative_labels", ArrayType(StringType()), True),
    ]
)


def skos_line(ident, label=None, alts=None):
    path = f"/authorities/subjects/{ident}"
    node = {"@id": f"http://id.loc.gov{path}"}
    if label is not None:
        node["skos:prefLabel"] = label
    if alts is not None:
        node["skos:altLabel"] = alts
    return json.dumps({"@id": path, "@graph": [node]})


def write_gz(path, lines, trailing_newline=True):
    body = "\n".join(lines) + ("\n" if trailing_newline else "")
    with gzip.open(path, "wt") as fh:
        fh.write(body)


def test_gz_ndjson_ingest_end_to_end(spark, tmp_path):
    # two dumps (subjects + names analogue), interleaved like Source.combine
    write_gz(tmp_path / "subjects.ndjson.gz", [
        skos_line("sh1", "Sanitation"),
        skos_line("sh2", "Libraries", alts=["Bibliothecas"]),
        skos_line("sh3-781", "Geo subdivision"),
        skos_line("sh4"),  # deprecated, no prefLabel
    ])
    # missing trailing newline must not lose the last record (Scroll.scala:8-18)
    write_gz(tmp_path / "names.ndjson.gz", [
        skos_line("n1", "Ada Lovelace"),
        skos_line("n2", "Grace Hopper"),
    ], trailing_newline=False)

    lines = spark.read.text(
        [f"file://{tmp_path}/subjects.ndjson.gz", f"file://{tmp_path}/names.ndjson.gz"]
    )
    concepts = filter_geographic_subdivisions(
        skos_transform(lines, "value", "lc-subjects")
    )

    table = LakeTable.create(
        str(tmp_path / "authoritative"), CONCEPTS_SCHEMA,
        key_cols=["authority", "identifier"], num_buckets=4,
    )
    src = concepts.withColumn("op", F.lit("U"))
    stats = merge_into(spark, table, src, fence_token="ingest:1")
    assert stats.inserted == 4  # sh1, sh2, n1, n2 (781 + deprecated dropped)

    got = {r["identifier"]: r.asDict() for r in table.read(spark).collect()}
    assert set(got) == {"sh1", "sh2", "n1", "n2"}
    assert got["sh2"]["alternative_labels"] == ["Bibliothecas"]

    # idempotent re-ingest: same fence token → skipped entirely
    again = merge_into(spark, table, src, fence_token="ingest:1")
    assert again.skipped
    # re-ingest without fence: everything a noop (doc_as_upsert semantics)
    third = merge_into(spark, table, src, fence_token="ingest:2")
    assert third.inserted == 0 and third.updated == 0 and third.noop == 4


def test_frame_overflow_guard(spark, tmp_path):
    """Oversized lines are rejected with a counted reason (ref: Scroll frame
    bound + FramingException, Scroll.scala:8-18 / ScrollTest.scala:14-63)."""
    import pytest

    from concepts_pipeline_spark.__main__ import main
    from concepts_pipeline_spark.operators.framing import (
        FrameOverflowError,
        bounded_frames,
    )

    good = skos_line("sh100", "ok label")
    huge = skos_line("sh200", "x" * 2048)  # > the 1 KiB test bound
    path = tmp_path / "dump.ndjson.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(good + "\n" + huge + "\n")

    lines = spark.read.text(str(path))
    ok, overflow = bounded_frames(lines, "value", max_bytes=1024)
    assert ok.count() == 1
    bad = overflow.collect()
    assert len(bad) == 1
    assert bad[0]["reject_reason"] == "frame_overflow"
    assert bad[0]["frame_bytes"] > 1024

    # CLI strict mode errors loudly (the reference's stream-failure semantics)
    with pytest.raises(FrameOverflowError, match="frame bound"):
        main([
            "ingest", "--input", str(path), "--table", str(tmp_path / "t1"),
            "--max-line-bytes", "1024",
        ])
    # drop mode counts and continues
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main([
            "ingest", "--input", str(path), "--table", str(tmp_path / "t2"),
            "--max-line-bytes", "1024", "--on-overflow", "drop",
        ])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["frame_overflow"] == 1
    assert out["inserted"] == 1
