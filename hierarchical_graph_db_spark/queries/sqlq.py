"""Pure-SQL queries through ``spark.sql`` over registered views — the
engine's second query surface (same Catalyst plans as the DataFrame API;
SURVEY.md §2's north-star relational coverage).

The interesting machinery here is free Catalyst work the reference never
had: CTE inlining, scalar-subquery decorrelation (the subquery becomes a
broadcast scalar), aggregate pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query

_BIG_SPENDERS = """
WITH cust_tot AS (
    SELECT o_custkey, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_big_spenders
FROM customer
JOIN cust_tot ON c_custkey = o_custkey
WHERE total > (SELECT round(2 * avg(total), 2) FROM cust_tot)
GROUP BY c_mktsegment
"""


@query("sql_scalar_subquery", _BIG_SPENDERS)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers spending >2× the per-customer average, per market segment —
    written in SQL, executed via ``spark.sql`` on registered views. The
    scalar subquery decorrelates to a broadcast scalar; the oracle runs the
    *same* SQL text in DuckDB."""
    Catalog(spark, sf_dir, register_views=True)
    return spark.sql(_BIG_SPENDERS)
