"""Multimodal columns: opaque binary media + typed metadata (north-star,
SURVEY.md §2.11).

Design: media is an opaque ``binary`` column in a MEDIA-schema row (id, kind,
content, content_type, dims/duration, source_uri). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` UDFs — the only
sane shape for CPU-heavy per-item work at 100 TB: no shuffle, embarrassingly
parallel over whatever partitioning the scan produced, and the binary bytes
never transit Python row-at-a-time.

The actual pixel/sample decoding is STUBBED (this container ships no
PIL/ffmpeg/librosa): each stub is gated behind an import-try and otherwise
produces a *deterministic fake* derived from sha256 of the bytes, so the
Spark-side plumbing — schemas, UDF signatures, batch iteration, partition
behavior — is real and testable, and swapping in a real codec is a pure
function replacement inside the batch loop.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder if ever available; not in this container
    from PIL import Image  # type: ignore  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

FEATURE_DIM = 16

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decode_error", StringType()),
    ]
)

FRAME_SAMPLE = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame_sha256", StringType()),
    ]
)


def load_media_dir(spark: SparkSession, base: str) -> DataFrame:
    """Binary-file scan of a media landing dir → MEDIA-ish rows. Kind is
    inferred from the extension; metadata columns fill during decode."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(base)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = (
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("unknown")
    )
    return df.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        kind.alias("kind"),
        F.col("content"),
        F.col("path").alias("source_uri"),
        F.col("length").alias("n_bytes"),
    )


def _fake_decode(raw: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for pixel decode: dims + a FEATURE_DIM float
    vector derived from the content digest. Stable across runs/engines."""
    d = hashlib.sha256(raw).digest()
    width = 1 + d[0] % 64
    height = 1 + d[1] % 64
    feats = [round(b / 255.0, 6) for b in d[2 : 2 + FEATURE_DIM]]
    return width, height, feats


def image_features(media: DataFrame, batch_debug_col: bool = False) -> DataFrame:
    """Decode + feature-extract per image (stubbed decode, real plumbing).

    Quarantine contract matches the email parser: a failing item yields a row
    with ``decode_error`` set — one bad file never fails a 100 TB job.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, raw, ctype in zip(pdf["media_id"], pdf["content"],
                                       pdf["content_type"]):
                try:
                    if _HAVE_PIL:  # pragma: no cover - not in container
                        raise NotImplementedError(
                            "real decode path: PIL present but wiring is "
                            "deliberately stubbed in this build")
                    raw_b = bytes(raw)
                    w, h, feats = _fake_decode(raw_b)
                    out.append({"media_id": mid, "content_type": ctype,
                                "n_bytes": len(raw_b), "width": w, "height": h,
                                "features": feats, "decode_error": None})
                except Exception as exc:
                    out.append({"media_id": mid, "content_type": ctype,
                                "n_bytes": None, "width": None, "height": None,
                                "features": None, "decode_error": repr(exc)})
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES])

    cols = media.select(
        "media_id",
        F.col("content"),
        F.coalesce(F.col("content_type"), F.lit("application/octet-stream"))
        .alias("content_type"),
    ) if "content_type" in media.columns else media.select(
        "media_id", "content", F.lit("application/octet-stream").alias("content_type")
    )
    return cols.mapInPandas(batches, schema=IMAGE_FEATURES)


def resize_metadata(features: DataFrame, max_side: int) -> DataFrame:
    """Resize planning as a pure relational op: new dims preserve aspect
    ratio, capped at ``max_side`` (actual pixel resample happens in the same
    mapInPandas stage as decode in a real build)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return features.select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("resized_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("resized_height"),
    )


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 duration_ms_col: str = "duration_ms") -> DataFrame:
    """Video frame sampling (stub): one row per sampled timestamp.

    The frame extraction itself is the stubbed step (sha256 of content ⊕
    index stands in for the frame bytes); the row explosion, schema, and
    partition behavior are the real scale concerns and are exercised.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, raw, dur in zip(pdf["media_id"], pdf["content"],
                                     pdf[duration_ms_col]):
                n = max(1, int(dur or 0) // every_ms)
                base = hashlib.sha256(bytes(raw)).hexdigest()
                for i in range(n):
                    frame_id = hashlib.sha256(f"{base}:{i}".encode()).hexdigest()
                    out.append({"media_id": mid, "frame_idx": i,
                                "ts_ms": i * every_ms, "frame_sha256": frame_id})
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLE])

    return media.select("media_id", "content", duration_ms_col).mapInPandas(
        batches, schema=FRAME_SAMPLE
    )
