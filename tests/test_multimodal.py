"""Multimodal plumbing: REAL container encode/decode (PNG/WAV/PPM, pure
stdlib) round-trips through the Arrow mapInPandas pipeline; metadata is
parsed from bytes, features come from fully decoded samples."""

from __future__ import annotations

import pytest

from concepts_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    WAV_N_SAMPLES,
    decode_media,
    encode_png,
    encode_ppm,
    encode_wav,
    extract_features,
    sample_features,
    synth_media,
)


def test_png_roundtrip_decodes_dims_and_pixels():
    seed = b"hello png world"
    p = encode_png(20, 7, seed)
    w, h, pixels = decode_media(p)
    assert (w, h) == (20, 7)
    assert len(pixels) == 3 * 20 * 7
    # pixel content is the deterministic function of the seed
    assert pixels[0] == (seed[0] + 0) % 256 and pixels[1] == (seed[0] + 0) % 256


def test_wav_roundtrip_decodes_rate_channels_and_frames():
    p = encode_wav(8250, 3, b"abc")
    rate, channels, data = decode_media(p)
    assert (rate, channels) == (8250, 3)
    assert len(data) == 2 * 3 * WAV_N_SAMPLES
    assert len(p) == 44 + len(data)  # canonical header: n_bytes is exact


def test_ppm_roundtrip_and_exact_length():
    p = encode_ppm(33, 5, b"xyz")
    w, h, body = decode_media(p)
    assert (w, h) == (33, 5)
    assert len(body) == 3 * 33 * 5
    assert len(p) == 9 + len("33") + len("5") + 3 * 33 * 5


def test_decode_rejects_garbage_and_passes_null():
    with pytest.raises(ValueError, match="unrecognized"):
        decode_media(b"\x00\x01\x02 not a container")
    assert decode_media(None) == (None, None, None)


def test_sample_features_shape_and_determinism():
    f = sample_features(bytes(range(64)))
    assert len(f) == FEATURE_DIM
    assert f == sample_features(bytes(range(64)))
    assert all(0.0 <= x <= 1.0 for x in f)
    assert sample_features(b"") == [0.0] * FEATURE_DIM


def test_spark_pipeline_end_to_end(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", f"document body {i} " * (i + 1)) for i in range(30)],
        "doc_id string, text string",
    )
    media = synth_media(docs, "text", "doc_id")
    rows = {r["media_id"]: r for r in media.collect()}
    assert len(rows) == 30
    assert {r["kind"] for r in rows.values()} == {"image", "audio", "video"}
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    for mid, m in rows.items():
        f = feats[mid]
        # n_bytes reported by synth equals the real payload length, and the
        # DECODED dims equal an independent Python-side parse of those bytes
        assert m["n_bytes"] == len(m["payload"])
        w, h, samples = decode_media(bytes(m["payload"]))
        assert (f["width"], f["height"]) == (w, h)
        assert list(f["features"]) == pytest.approx(sample_features(samples))
        if m["kind"] == "audio":
            assert 8000 <= f["width"] <= 8000 + 50 * 47 and 1 <= f["height"] <= 4
        else:
            assert 16 <= f["width"] <= 63 and 16 <= f["height"] <= 63
