"""Multimodal column plumbing: opaque binary payloads + typed metadata, processed
via Arrow-batched mapInPandas.

The decode step is REAL pure-Python container parsing — PNG (IHDR + zlib
IDAT), WAV (RIFF fmt + PCM16 data), PPM (P6) — no media libraries needed:

- ``synth_media`` renders each document into an actual encoded file: a PNG
  image, a WAV clip, or a PPM frame, with dimensions derived deterministically
  from md5(key) (so an external oracle can recompute the expected metadata
  without parsing bytes).
- ``extract_features`` decodes the container: dimensions come FROM THE BYTES
  (signature check, IHDR/fmt/header parse), pixel/sample payloads are fully
  decoded (zlib inflate + PNG filter reversal for PNG), and the feature
  vector is computed over decoded samples.

The one remaining stub boundary is the EMBEDDING ITSELF: a production system
runs a learned model over the decoded samples; here the "embedding" is a
deterministic per-lane byte-mean profile over the decoded samples (documented,
testable, model-free). Everything else — schema contract, Arrow batching,
partition sizing, null handling, real container parsing — is the production
plumbing a model would drop into.
"""

from __future__ import annotations

import struct
import zlib
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
        StructField("payload", BinaryType(), True),  # real encoded bytes
        StructField("mime", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),   # parsed from the container
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 8

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "image/x-portable-pixmap"}

# deterministic dimension derivations, shared with the SQL oracle:
#   k  = md5hex(key)[0:4]  as int  → kind = [image,audio,video][k % 3]
#   b1 = md5hex(key)[4:8]  as int, mod 48
#   b2 = md5hex(key)[8:12] as int, mod 48
#   image/video: width = 16 + b1, height = 16 + b2
#   audio:       width = sample_rate = 8000 + 50·b1, height = channels = 1 + (b2 % 4)
WAV_N_SAMPLES = 16  # per channel, fixed


def _md5_int(col, lo: int, n: int):
    return F.conv(F.substring(F.md5(col), lo, n), 16, 10).cast("int")


# ---------------------------------------------------------------------------
# encoders (pure stdlib)
# ---------------------------------------------------------------------------

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(w: int, h: int, seed: bytes) -> bytes:
    """8-bit RGB PNG, filter None per scanline, pixels derived from seed."""
    n = len(seed) or 1
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter: None
        for x in range(w):
            v = seed[(x + y) % n] if seed else 0
            raw += bytes(((v + x) % 256, (v + y) % 256, (v * 3 + x + y) % 256))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_wav(rate: int, channels: int, seed: bytes) -> bytes:
    """Canonical 44-byte-header PCM16 WAV, WAV_N_SAMPLES frames."""
    n = len(seed) or 1
    frames = bytearray()
    for i in range(WAV_N_SAMPLES):
        for c in range(channels):
            v = (seed[(i * channels + c) % n] if seed else 0) * 128 - 16384
            frames += struct.pack("<h", v)
    data = bytes(frames)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * channels * 2, channels * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def encode_ppm(w: int, h: int, seed: bytes) -> bytes:
    """Binary P6 PPM 'video frame'."""
    n = len(seed) or 1
    body = bytearray()
    for y in range(h):
        for x in range(w):
            v = seed[(x * 2 + y) % n] if seed else 0
            body += bytes(((v + x) % 256, (v + y) % 256, (v ^ (x + y)) % 256))
    return f"P6\n{w} {h}\n255\n".encode("ascii") + bytes(body)


# ---------------------------------------------------------------------------
# decoders (pure stdlib; raise ValueError on anything unrecognized)
# ---------------------------------------------------------------------------

def decode_media(payload: bytes | None) -> tuple[int | None, int | None, bytes | None]:
    """Parse a PNG/WAV/PPM container: (width, height, decoded samples).

    - PNG: IHDR dims; IDAT inflated, per-scanline filter reversed (only
      filter 0 is produced by encode_png; filters 1-4 are rejected loudly —
      this is a parser for the engine's own container contract, not libpng).
    - WAV: (sample_rate, channels) as (width, height); PCM16 data bytes.
    - PPM: P6 dims; raw RGB bytes.
    """
    if payload is None:
        return None, None, None
    b = bytes(payload)
    if b.startswith(_PNG_SIG):
        if b[12:16] != b"IHDR":
            raise ValueError("PNG: first chunk is not IHDR")
        w, h = struct.unpack(">II", b[16:24])
        # walk chunks, concatenate IDAT
        idat = bytearray()
        off = 8
        while off + 8 <= len(b):
            (ln,) = struct.unpack(">I", b[off:off + 4])
            typ = b[off + 4:off + 8]
            if typ == b"IDAT":
                idat += b[off + 8:off + 8 + ln]
            off += 12 + ln
            if typ == b"IEND":
                break
        raw = zlib.decompress(bytes(idat))
        stride = 1 + 3 * w
        pixels = bytearray()
        for y in range(h):
            row = raw[y * stride:(y + 1) * stride]
            if row[0] != 0:
                raise ValueError(f"PNG: unsupported filter {row[0]}")
            pixels += row[1:]
        return int(w), int(h), bytes(pixels)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        channels, rate = struct.unpack("<HI", b[22:28])
        (data_len,) = struct.unpack("<I", b[40:44])
        return int(rate), int(channels), b[44:44 + data_len]
    if b[:2] == b"P6":
        # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
        parts = b[2:].split(maxsplit=3)
        w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
        if maxval != 255:
            raise ValueError(f"PPM: unsupported maxval {maxval}")
        data = parts[3] if len(parts) > 3 else b""
        return w, h, bytes(data[: 3 * w * h])
    raise ValueError(f"unrecognized container (first bytes {b[:8]!r})")


def sample_features(samples: bytes | None) -> list[float] | None:
    """The model stand-in: per-lane byte means over DECODED samples —
    deterministic, testable, and honest about where a learned embedding
    would plug in."""
    if samples is None:
        return None
    if not samples:
        return [0.0] * FEATURE_DIM
    out = []
    for i in range(FEATURE_DIM):
        lane = samples[i::FEATURE_DIM]
        out.append(round(sum(lane) / (len(lane) or 1) / 255.0, 6) if lane else 0.0)
    return out


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def synth_media(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Render a REAL binary media table from a text table: each row becomes an
    actual PNG / WAV / PPM file whose dimensions derive from md5(key) (the
    derivations are documented above so external oracles can recompute them)
    and whose pixel/sample content derives from the text bytes."""
    key_s = F.col(key_col).cast("string")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(_md5_int(key_s, 1, 4), F.lit(3)) + 1).cast("int"),
    )
    plan = df.select(
        key_s.alias("media_id"),
        kind.alias("kind"),
        F.pmod(_md5_int(key_s, 5, 4), F.lit(48)).alias("__b1"),
        F.pmod(_md5_int(key_s, 9, 4), F.lit(48)).alias("__b2"),
        F.encode(F.col(text_col), "utf-8").alias("__seed"),
    )

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for kind, b1, b2, seed in zip(
                pdf["kind"], pdf["__b1"], pdf["__b2"], pdf["__seed"]
            ):
                seed = bytes(seed) if seed is not None else b""
                if kind == "image":
                    p = encode_png(16 + int(b1), 16 + int(b2), seed)
                elif kind == "audio":
                    p = encode_wav(8000 + 50 * int(b1), 1 + int(b2) % 4, seed)
                else:
                    p = encode_ppm(16 + int(b1), 16 + int(b2), seed)
                payloads.append(p)
                mimes.append(_MIME[kind])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "mime": mimes,
                    "n_bytes": pd.array(
                        [len(p) for p in payloads], dtype="Int32"
                    ),
                }
            )

    return plan.mapInPandas(render, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """Arrow-batched container decode + feature extraction over the binary
    column. mapInPandas streams Arrow record batches through Python once per
    partition — the decode cost dominates, transfer is amortized. At scale,
    repartition upstream so each task holds O(batch_hint_rows × mean_payload)
    bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, f = [], [], []
            for payload in pdf["payload"]:
                wi, hi, samples = decode_media(payload)
                w.append(wi)
                h.append(hi)
                f.append(sample_features(samples))
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
