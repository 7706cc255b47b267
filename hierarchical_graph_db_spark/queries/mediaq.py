"""Multimodal-column queries.

No fixture media table exists, so binary content is synthesized
deterministically from ``documents.text`` (utf-8 encode) — the point is the
*plumbing*: binary columns flowing through Arrow-batched mapInPandas feature
extraction with quarantine, at the schema/batch shape production uses. The
decode is the documented deterministic stub (``operators/multimodal.py``) —
and because the stub derives everything from sha256 of the bytes, its whole
contract is reproducible in SQL: even these Python-UDF paths are
hash-checked against DuckDB, not just smoke-run.
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


def _sql_byte(i: int) -> str:
    """Byte *i* of sha256(text) from its hex digest (0-based), matching
    Python ``digest()[i]``."""
    hi = f"(strpos('0123456789abcdef', substr(hx, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr(hx, {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


_SQL_DIMS = f"""
    SELECT doc_id AS media_id,
           octet_length(encode(text))        AS n_bytes,
           1 + {_sql_byte(0)} % 64           AS width,
           1 + {_sql_byte(1)} % 64           AS height,
           round({_sql_byte(2)} / 255.0, 6)  AS f0
    FROM (SELECT doc_id, text, sha256(text) AS hx FROM documents)
"""


@query(
    "multimodal_image_features",
    f"""
    SELECT media_id,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(width  AS INT)     AS width,
           CAST(height AS INT)     AS height,
           f0,
           CAST(NULL AS VARCHAR)   AS decode_error
    FROM ({_SQL_DIMS})
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → (dims, feature) per item through the mapInPandas
    decode/extract stage; the sha256-derived stub decode is reproduced in the
    oracle, so the UDF plumbing is differential-tested end to end."""
    feats = image_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", "n_bytes", "width", "height",
        # features persist as float32; re-round after widening so the value
        # is the stub's 6-decimal contract, not float32 noise
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
        "decode_error",
    )


@query(
    "multimodal_resize_plan",
    f"""
    SELECT media_id,
           CAST(width AS INT)  AS width,
           CAST(height AS INT) AS height,
           CAST(ceil(width * least(1.0, 32.0 / greatest(width, height)))
                AS INT) AS resized_width,
           CAST(ceil(height * least(1.0, 32.0 / greatest(width, height)))
                AS INT) AS resized_height
    FROM ({_SQL_DIMS})
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over extracted dims (aspect-preserving, never
    upscales) — pure relational stage downstream of decode."""
    feats = image_features(_media(spark, sf_dir))
    return resize_metadata(feats, max_side=32)


@query(
    "multimodal_frame_sample",
    """
    SELECT doc_id AS media_id,
           CAST(t.i AS INT)       AS frame_idx,
           CAST(t.i * 1000 AS BIGINT) AS ts_ms,
           sha256(sha256(text) || ':' || t.i) AS frame_sha256
    FROM documents,
         unnest(range(0, greatest(1, doc_id % 10))) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling row-explosion for video-shaped media: one row per
    sampled timestamp, ids = sha256(content-digest : index) — reproduced
    verbatim in the oracle."""
    return frame_sample(_media(spark, sf_dir), every_ms=1000)


_FRAME, _HOP = 64, 32


@query(
    "multimodal_audio_frame_energy",
    f"""
    WITH sig AS (
        SELECT doc_id,
               list_transform(string_split(text, ''), c -> ascii(c))
                   AS samples
        FROM documents
    ),
    framed AS (
        SELECT doc_id, samples,
               CASE WHEN len(samples) >= {_FRAME}
                    THEN (len(samples) - {_FRAME}) // {_HOP} + 1
                    ELSE 0 END AS nf
        FROM sig
    )
    SELECT doc_id, CAST(f AS BIGINT) AS frame,
           CAST(list_sum(list_transform(
                samples[f * {_HOP} + 1 : f * {_HOP} + {_FRAME}],
                x -> x * x)) AS BIGINT) AS energy,
           CAST(list_max(
                samples[f * {_HOP} + 1 : f * {_HOP} + {_FRAME}])
                AS BIGINT) AS peak,
           round(list_sum(samples[f * {_HOP} + 1 : f * {_HOP} + {_FRAME}])
                 / {_FRAME}.0, 4) AS mean_level
    FROM framed, unnest(range(0, nf)) AS t(f)
    """,
)
def multimodal_audio_frame_energy(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Fixed-window signal framing — the audio feature-extraction shape
    (frame 64, hop 32: per-frame energy Σx², peak, mean level), run on a
    DETERMINISTIC synthetic signal (each document's character codes stand
    in for PCM samples — the container ships no audio codecs, so like the
    image stub the decode is substituted while the framing/feature
    plumbing is real and hash-checked). The frame loop is a pure
    expression — sequence → slice → integer fold inside the project, one
    explode; no UDF, no shuffle before the explode. A real pipeline swaps
    the sample source for decoded PCM behind the same frame math."""
    docs = Catalog(spark, sf_dir).documents
    # the lookahead split emits a trailing "" element (the regex also
    # matches at end-of-string) — drop it so lengths match string_split('')
    codes = F.transform(
        F.filter(F.split(F.col("text"), "(?!^)"), lambda c: c != ""),
        lambda c: F.ascii(c))
    n = F.size("samples")
    nf = F.when(n >= _FRAME, F.floor((n - _FRAME) / _HOP) + 1) \
        .otherwise(F.lit(0)).cast("int")
    frame_slice = F.slice(F.col("samples"), F.col("f") * _HOP + 1, _FRAME)
    energy = F.aggregate(frame_slice, F.lit(0).cast("bigint"),
                         lambda acc, x: acc + (x * x).cast("bigint"))
    total = F.aggregate(frame_slice, F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x.cast("bigint"))
    return (
        docs.select("doc_id", codes.alias("samples"))
        # sequence(0, -1) would generate a DESCENDING ramp for frameless
        # short docs — gate on nf > 0 and emit an empty array instead.
        .select("doc_id", "samples",
                F.explode(F.when(nf > 0, F.sequence(F.lit(0), nf - 1))
                          .otherwise(F.array().cast("array<int>")))
                .alias("f"))
        .select("doc_id", F.col("f").cast("bigint").alias("frame"),
                energy.alias("energy"),
                F.array_max(frame_slice).cast("bigint").alias("peak"),
                F.round(total / F.lit(float(_FRAME)), 4).alias("mean_level"))
    )
