"""Data-quality profile query over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@query(
    "chi_square_independence",
    """
    WITH joined AS (
        SELECT c.c_mktsegment AS segment, e.event_type
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    ),
    obs AS (SELECT segment, event_type, count(*) AS o
            FROM joined GROUP BY segment, event_type),
    rt  AS (SELECT segment, sum(o) AS row_tot FROM obs GROUP BY segment),
    ct  AS (SELECT event_type, sum(o) AS col_tot FROM obs GROUP BY event_type),
    n   AS (SELECT sum(o) AS total FROM obs)
    SELECT round(sum(
               pow(o - (row_tot * col_tot / CAST(total AS DOUBLE)), 2)
               / (row_tot * col_tot / CAST(total AS DOUBLE))), 4) AS chi2,
           CAST((count(DISTINCT obs.segment) - 1)
                * (count(DISTINCT obs.event_type) - 1) AS BIGINT) AS dof
    FROM obs JOIN rt ON obs.segment = rt.segment
             JOIN ct ON obs.event_type = ct.event_type
             CROSS JOIN n
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence for event_type × customer
    segment — the data-profiling statistic for 'is this feature correlated
    with that label'. The contingency table is one hash aggregate; row and
    column marginals re-aggregate *the table* (|segments|×|types| rows, not
    the raw events) and broadcast back; the statistic folds in a final
    1-row aggregate. Nothing rescans the fact."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.select("user_id", "event_type")
    dim = cat.customer.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    obs = (
        ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = obs.groupBy("segment").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("event_type").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("total"))
    expected = (F.col("row_tot") * F.col("col_tot")
                / F.col("total").cast("double"))
    return (
        obs.join(F.broadcast(rt), "segment")
        .join(F.broadcast(ct), "event_type")
        .join(F.broadcast(n))
        .agg(
            F.round(F.sum(F.pow(F.col("o") - expected, 2) / expected), 4)
            .alias("chi2"),
            ((F.countDistinct("segment") - 1)
             * (F.countDistinct("event_type") - 1)).alias("dof"),
        )
    )
