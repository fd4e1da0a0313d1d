"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself requires codec libraries not present in this
container, so it is STUBBED: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (derived
only from the bytes) stands in. What IS real and tested here is the
Spark-side plumbing a 100 TB multimodal pipeline needs: binary schema,
Arrow batch shape, UDF signatures, partition-preserving mapInPandas.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, content binary, "
    "width int, height int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, content_hash string, "
    "feat array<double>"
)


def decode_image(content: bytes, fake: bool = False) -> list[float]:
    """Decode an image to an 8-dim feature vector.

    ``fake=True`` — the ORACLE path: a deterministic vector derived only
    from the raw bytes (md5 prefix), stable across runs/engines; this is
    what the catalog queries and DuckDB oracles pin.

    ``fake=False`` — the REAL path (r6): decodes through Pillow when it
    is installed and emits the same 8-dim shape with image-derived
    values — [width/4096, height/4096, mean R, mean G, mean B, min
    luminance, max luminance, mean luminance], all in [0, 1] and
    deterministic for a given image. Without Pillow it raises
    NotImplementedError naming the fake path (this container ships no
    codec libraries); the integration test is importorskip-gated."""
    if fake:
        digest = hashlib.md5(content).digest()
        return [b / 255.0 for b in digest[:8]]
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "use fake=True for the deterministic stub"
        ) from exc
    import io

    with Image.open(io.BytesIO(content)) as im:
        rgb = im.convert("RGB")
        w, h = rgb.size
        px = list(rgb.getdata())
    n = len(px) or 1
    lum = [(0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2]) / 255.0 for p in px]
    return [
        min(w, 4096) / 4096.0,
        min(h, 4096) / 4096.0,
        sum(p[0] for p in px) / (255.0 * n),
        sum(p[1] for p in px) / (255.0 * n),
        sum(p[2] for p in px) / (255.0 * n),
        min(lum, default=0.0),
        max(lum, default=0.0),
        sum(lum) / n,
    ]


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media rows.

    Arrow ships each partition as pandas batches; the UDF is pure
    (bytes → features), so the operation is embarrassingly parallel and
    partition-preserving — no shuffle."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feat": content.map(
                        lambda b: decode_image(b, fake=fake_decode) if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing via mapInPandas: output binary is exactly
    width·height bytes per row. The resample itself is stubbed (real codecs
    absent — bytes are cycled/truncated deterministically), but the batch
    shape, binary-in/binary-out signature, and metadata columns are the
    real contract a decoder plugs into."""
    out_schema = "media_id bigint, media_type string, content binary, width int, height int"
    n = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def cycle(b: bytes | None) -> bytes | None:
                if b is None:
                    return None
                if not b:
                    return bytes(n)
                reps = (n + len(b) - 1) // len(b)
                return (b * reps)[:n]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": pdf["content"].map(cycle),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_resize, out_schema)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.
    Frame decode is stubbed (NotImplementedError path in decode_image); the
    row-explosion shape (posexplode over a computed frame index sequence) is
    the real part."""
    n_frames = (F.length(F.col("content")) / 1024).cast("int") + 1  # fake frame count
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )


def binary_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass (no Python): sizes + md5 per media row —
    the cheap pre-filter a multimodal pipeline runs before any decode."""
    return df.select(
        "media_id",
        "media_type",
        F.length(F.col("content")).cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_hash"),
    )
