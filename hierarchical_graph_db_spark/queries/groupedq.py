"""Grouped-UDF query: the ``applyInPandas`` path with a SQL-checkable
contract (DuckDB ``regr_slope`` is the oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.grouped import user_value_trend
from hierarchical_graph_db_spark.queries import query


@query(
    "grouped_udf_user_trend",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT)                         AS n_events,
           round(regr_slope(value, epoch(ts)), 6)           AS slope
    FROM events
    GROUP BY user_id
    """,
)
def grouped_udf_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value-over-time OLS slope via an Arrow-grouped pandas UDF;
    the oracle recomputes it with SQL regression aggregates — differential
    proof that the Python group math matches the relational contract."""
    return user_value_trend(Catalog(spark, sf_dir).events)
