"""Multimodal column plumbing: opaque binary payloads + typed metadata, processed
via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): `decode_stub`
produces deterministic fake features from the bytes. Everything around it — the
schema contract, batch iteration, partition sizing, null handling — is the real
Spark plumbing a production decode (PIL/torchaudio/ffmpeg) would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),   # fake-decoded dimensions
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),  # fixed-dim embedding
    ]
)

FEATURE_DIM = 8


def synth_media(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Derive a deterministic binary media table from a text table (test harness:
    payload = utf-8 bytes; kind cycles image/audio/video)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.col(key_col)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(key_col).cast("string").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("int").alias("n_bytes"),
    )


def decode_stub(payload: bytes | None) -> tuple[int | None, int | None, list[float] | None]:
    """Deterministic fake decode. A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))          # NotImplementedError here
        return img.width, img.height, embed(img)

    The fake derives stable pseudo-features from byte content so tests can assert
    exact values end-to-end."""
    if payload is None:
        return None, None, None
    n = len(payload)
    s = sum(payload[:256])
    width = (s % 64) + 16
    height = ((s // 64) % 64) + 16
    feats = [round(((s * (i + 1) + n) % 1000) / 1000.0, 6) for i in range(FEATURE_DIM)]
    return width, height, feats


def extract_features(media: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas streams Arrow record batches through Python once per partition —
    the decode cost dominates, transfer is amortized. At scale, repartition upstream
    so each task holds O(batch_hint_rows × mean_payload) bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, f = [], [], []
            for payload in pdf["payload"]:
                wi, hi, fi = decode_stub(payload)
                w.append(wi)
                h.append(hi)
                f.append(fi)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "features": f,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)
