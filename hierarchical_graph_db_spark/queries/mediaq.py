"""Multimodal-column queries (rows-only driver checks).

No fixture media table exists, so binary content is synthesized
deterministically from ``documents.text`` (utf-8 encode) — the point is the
*plumbing*: binary columns flowing through Arrow-batched mapInPandas feature
extraction with quarantine, at the schema/batch shape production uses. The
decode itself is the documented deterministic stub
(``operators/multimodal.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.multimodal import (
    frame_sample,
    image_features,
    resize_metadata,
)
from hierarchical_graph_db_spark.queries import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/png").alias("content_type"),
        ((F.col("doc_id") % 10) * 1000 + 500).alias("duration_ms"),
    )


@query("multimodal_image_features", None)  # stubbed decode → rows-only
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → (dims, feature vector) per item through the mapInPandas
    decode/extract stage; deterministic stub features."""
    feats = image_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", "n_bytes", "width", "height",
        F.element_at("features", 1).alias("f0"),
        "decode_error",
    )


@query("multimodal_resize_plan", None)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over extracted dims (aspect-preserving, never
    upscales) — pure relational stage downstream of decode."""
    feats = image_features(_media(spark, sf_dir))
    return resize_metadata(feats, max_side=32)


@query("multimodal_frame_sample", None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling row-explosion for video-shaped media (1 row per
    sampled timestamp, deterministic ids)."""
    return frame_sample(_media(spark, sf_dir), every_ms=1000)
