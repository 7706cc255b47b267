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
    WITH p AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS x, value
        FROM events
    ),
    m AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS sy_cells
        FROM p GROUP BY user_id
    ),
    mm AS (
        SELECT p.user_id,
               max(m.n_events) AS n_events,
               CAST(sum(CAST(floor(
                   (CAST(p.x AS DOUBLE) - m.sx / m.n_events)
                   * (p.value - (m.sy_cells / 1000000.0) / m.n_events)
                   * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxy_cells,
               CAST(sum(CAST(floor(
                   (CAST(p.x AS DOUBLE) - m.sx / m.n_events)
                   * (CAST(p.x AS DOUBLE) - m.sx / m.n_events)
                   + 0.5) AS BIGINT)) AS BIGINT) AS sxx_cells
        FROM p JOIN m ON m.user_id = p.user_id
        GROUP BY p.user_id
    )
    SELECT user_id, n_events,
           CASE WHEN sxx_cells = 0 THEN NULL
                ELSE floor(((sxy_cells / 1000.0) / sxx_cells) * 1000000.0
                           + 0.5) / 1000000.0
           END AS slope
    FROM mm
    """,
)
def grouped_udf_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value-over-time OLS slope via an Arrow-grouped pandas UDF;
    the oracle replays the identical fixed-point centered moments (see
    operators/grouped.py for why plain ``regr_slope`` is not a stable
    cross-engine oracle once slopes shrink near the 6dp rounding grain) —
    differential proof that the Python group math matches the relational
    contract."""
    return user_value_trend(Catalog(spark, sf_dir).events)
