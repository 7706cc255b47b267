"""Scalar/array expression builders (JVM-side Catalyst expressions).

Everything here returns :class:`pyspark.sql.Column` built from
``pyspark.sql.functions`` — no Python UDFs — so the hot path stays inside
whole-stage codegen. The only Python UDFs in the engine live in
``sources/email_parse.py`` (RFC822 parsing, inherently Python) and
``operators/multimodal.py`` (binary decode stubs), both Arrow-batched.
"""

from hierarchical_graph_db_spark.functions.hashing import (
    content_hash,
    dedupe_key,
    fingerprint,
    normalized_text,
)
from hierarchical_graph_db_spark.functions.text import (
    language_id,
    quality_metrics,
    stopword_hits,
    tokens,
)
from hierarchical_graph_db_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "content_hash",
    "dedupe_key",
    "fingerprint",
    "normalized_text",
    "tokens",
    "stopword_hits",
    "language_id",
    "quality_metrics",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
