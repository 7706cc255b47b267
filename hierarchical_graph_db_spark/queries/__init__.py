"""Query registry: every operator from SURVEY.md §2, demonstrated as a query
over the driver's synthetic tables, paired with its DuckDB oracle SQL.

``REGISTRY`` maps name → QuerySpec(run, oracle). ``__spark_entry__.py`` is a
thin re-export of this registry.

Oracle-parity rules (learned the hard way; keep following them):
* alias every computed column identically in Spark and SQL;
* round float aggregates (sums of 2-dp money to 2 dp; avgs to 4-6 dp) so
  parallel-summation order can't flip the hash;
* cast DuckDB integer sums to BIGINT (DuckDB sums to HUGEINT, Spark to long);
* arrays → sort, then join to a delimited string (engines hash arrays
  differently; strings are unambiguous);
* cross-engine hashes must be sha256-hex based (never xxhash64/murmur —
  engine-specific);
* regexp_replace needs the 'g' flag in DuckDB to match Spark's replace-all.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    run: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only driver check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def load() -> dict[str, QuerySpec]:
    """Import all query modules (they self-register) and return the registry."""
    from hierarchical_graph_db_spark.queries import (  # noqa: F401
        cdcq,
        classifierq,
        curationq,
        dedup,
        emailq,
        graphq,
        groupedq,
        mediaq,
        nerq,
        pivotq,
        profileq,
        relational,
        similarityq,
        sketchq,
        sqlq,
        streamingq,
        textq,
        tfidfq,
        timeseriesq,
        tokenizerq,
        tpchq,
        trainingq,
        windowsq,
    )

    return REGISTRY
