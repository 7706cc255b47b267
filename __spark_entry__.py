"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``hierarchical_graph_db_spark/queries``): ``entry`` runs the flagship
hierarchical rollup at sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hierarchical_graph_db_spark.queries import load

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load()
    return registry["flagship_hierarchy_rollup"].run(spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.run for name, spec in load().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query."""
    return {
        name: spec.oracle for name, spec in load().items() if spec.oracle is not None
    }
