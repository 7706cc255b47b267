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
* regexp_replace needs the 'g' flag in DuckDB to match Spark's replace-all;
* when a rounded value FEEDS FURTHER COMPUTATION (fixed-point training,
  standardization, iterative replay), never quantize with the engines'
  decimal ``round``: Spark rounds HALF_UP over the shortest decimal repr
  (BigDecimal.valueOf) while DuckDB rounds the binary double, and they
  disagree whenever the double prints as an exact decimal ``…5`` one
  place past the rounding digit — integer-ratio features (counts divided
  by counts) hit such terminating decimals routinely (first observed at
  sf1: 323/640 = 0.5046875 → Spark 0.504688, DuckDB 0.504687). Use
  ``floor(x*10^k + 0.5)/10^k`` on BOTH sides instead (pure IEEE mul/add/
  floor → bit-identical; see operators/lr.py). Plain display rounding of
  a final aggregate is fine — a last-digit flip there needs the exact
  boundary value, while amplified divergence needs only one row anywhere
  in the corpus.
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
