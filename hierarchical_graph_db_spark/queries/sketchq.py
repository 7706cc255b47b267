"""Quantiles + cardinality sketches over the fixtures.

Exact percentiles are cross-engine checkable (Spark ``percentile`` and
DuckDB ``quantile_cont`` both do linear interpolation). HLL
(``approx_count_distinct``) is a sketch whose exact output is
engine-specific, so it gets a rows-only driver check plus a pytest accuracy
bound against the exact count — the right correctness statement for a
sketch: bounded error, not byte equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query


@query(
    "agg_exact_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag. At 100 TB exact
    percentiles need a full sort per group — the production swap is
    percentile_approx (t-digest) at fixed error; the exact form is the
    correctness baseline, same relationship as brute-force vs LSH in the
    ANN family."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@query("agg_hll_distinct", None)  # sketch: engine-specific bits → rows-only;
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event_type (rsd 2%). Error bound vs
    the exact count is asserted in tests/test_sketches.py — sketches are
    graded on bounded error, not byte equality."""
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
