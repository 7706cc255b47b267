"""Data-quality profile query over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.profiling import profile
from hierarchical_graph_db_spark.queries import query


@query(
    "profile_documents",
    """
    SELECT 'doc_id' AS column, CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_repr, CAST(max(doc_id) AS VARCHAR) AS max_repr
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT), min(lang), max(lang)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT), min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile (nulls, cardinality, range) — the ingest
    quality gate, all columns in a single aggregation."""
    docs = Catalog(spark, sf_dir).documents
    return profile(docs, ["doc_id", "lang", "source", "n_chars"])
