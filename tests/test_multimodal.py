"""Multimodal binary-column plumbing: decode gating, frame sampling shape,
and the JVM-only stats pass vs the Python path agreeing byte-for-byte."""

import pytest
from pyspark.sql import functions as F

from mbgspark.operators.multimodal import (
    binary_stats,
    decode_image,
    extract_features,
    frame_sample,
)


def _media(spark):
    # media_id is bigint by contract (FEATURE_SCHEMA) — ids come from doc_id
    return spark.createDataFrame(
        [(1, "image/png", b"x" * 3000), (2, "audio/wav", b"hello")],
        "media_id long, media_type string, content binary",
    )


def test_decode_gated_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)
    feats = decode_image(b"abc", fake=True)
    assert len(feats) == 8 and feats == decode_image(b"abc", fake=True)


def test_frame_sample_shape(spark):
    rows = frame_sample(_media(spark), every_n=1).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # 3000 bytes -> ceil fake frame count 3; 5 bytes -> 1 frame
    assert by_id[1] == [0, 1, 2]
    assert by_id[2] == [0]


def test_binary_stats_matches_python_path(spark):
    media = _media(spark)
    jvm = {
        r["media_id"]: (r["n_bytes"], r["content_hash"])
        for r in binary_stats(media).collect()
    }
    py = {
        r["media_id"]: (r["n_bytes"], r["content_hash"])
        for r in extract_features(media).collect()
    }
    assert jvm == py
    assert jvm[2][0] == 5


def test_resize_media_exact_output_size(spark):
    from mbgspark.operators.multimodal import resize_media

    out = {
        r["media_id"]: r
        for r in resize_media(_media(spark), width=4, height=3).collect()
    }
    assert len(out[1]["content"]) == 12 and len(out[2]["content"]) == 12
    assert out[2]["content"] == (b"hello" * 3)[:12]  # deterministic cycle
    assert (out[1]["width"], out[1]["height"]) == (4, 3)
