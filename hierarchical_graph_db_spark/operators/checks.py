"""Declarative data-quality constraint suite (the Deequ / Great Expectations
pattern — Schelter et al., "Automating Large-Scale Data Quality Verification
at Scale", VLDB 2018; public method).

Training pipelines gate every batch on declared constraints: columns are
complete, keys unique, values in range/set, foreign keys resolve. The engine
form mirrors Deequ's core insight: every row-local constraint reduces to a
conditional aggregate, so an arbitrary number of checks over one table costs
ONE scan + ONE aggregation (all observed metrics computed in the same
``agg``), then melts to a long (check, column, observed, threshold, passed)
report. Referential integrity is the one non-row-local check and costs one
join pass per (fact, dim) pair.

Scale shape:
* per-table suite — single scan, map-side partial aggregation, a 1-row wide
  result exploded driver-free into the report rows; adding a 50th check adds
  one aggregate expression, not a pass;
* ``uniqueness`` uses exact ``count_distinct`` (expanded by Catalyst); at
  100 TB swap for ``approx_count_distinct`` per the sketch-accuracy contract
  in ``queries/sketchq.py`` — the report schema doesn't change;
* referential integrity — the dim side collapses to its distinct keys
  before the join; small dims broadcast (the demo query's shape), large
  dims fall back to a shuffled left join, either way the observed metric is
  a fraction of matched fact rows, partial-aggregated map-side.

Determinism: every observed metric is a ratio of bigint counts rounded to
6 dp — no float-summation order anywhere — so the report hash-replays
cross-engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declared constraint: ``observed >= threshold`` passes. ``obs`` is
    the aggregate expression producing the observed metric (a ratio in
    [0, 1] for the built-ins)."""

    name: str
    column: str
    obs: Column
    threshold: float


def _ratio(num: Column, den: Column) -> Column:
    """num/den as a 6-dp double, vacuously 1.0 on an empty denominator
    (try_divide: ANSI mode raises on /0, and an empty table is a pass,
    not an error)."""
    return F.coalesce(
        F.round(F.try_divide(num.cast("bigint"), den.cast("bigint")), 6),
        F.lit(1.0),
    )


def completeness(column: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows with a non-null value."""
    return Check("completeness", column,
                 _ratio(F.count(column), F.count(F.lit(1))), min_ratio)


def uniqueness(column: str, min_ratio: float = 1.0) -> Check:
    """Distinct values per non-null row (1.0 == the column is a key)."""
    return Check("uniqueness", column,
                 _ratio(F.count_distinct(F.col(column)), F.count(column)),
                 min_ratio)


def satisfies(name: str, column: str, pred: Column,
              min_ratio: float = 1.0) -> Check:
    """Fraction of rows satisfying an arbitrary row-local predicate."""
    return Check(name, column,
                 _ratio(F.sum(F.when(pred, 1).otherwise(0)),
                        F.count(F.lit(1))),
                 min_ratio)


def in_range(column: str, lo: float, hi: float,
             min_ratio: float = 1.0) -> Check:
    return satisfies("in_range", column,
                     F.col(column).between(lo, hi), min_ratio)


def in_set(column: str, values: list, min_ratio: float = 1.0) -> Check:
    return satisfies("in_set", column, F.col(column).isin(values), min_ratio)


def matches(column: str, regex: str, min_ratio: float = 1.0) -> Check:
    return satisfies("matches", column, F.col(column).rlike(regex), min_ratio)


_REPORT_COLS = ("check", "column", "observed", "threshold", "passed")


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every row-local check in ONE aggregation over ``df`` →
    (check, column, observed, threshold, passed), one row per check, in
    declaration order via an explicit ordinal (no row-order reliance)."""
    wide = df.agg(*[c.obs.alias(f"__obs{i}") for i, c in enumerate(checks)])
    rows = F.explode(F.array(*[
        F.struct(
            F.lit(c.name).alias("check"),
            F.lit(c.column).alias("column"),
            F.col(f"__obs{i}").cast("double").alias("observed"),
            F.lit(float(c.threshold)).alias("threshold"),
            (F.col(f"__obs{i}") >= F.lit(c.threshold)).alias("passed"),
        )
        for i, c in enumerate(checks)
    ])).alias("r")
    return wide.select(rows).select("r.*")


def referential_integrity(fact: DataFrame, fk: str, dim: DataFrame, pk: str,
                          min_ratio: float = 1.0,
                          broadcast_dim: bool = True) -> DataFrame:
    """Fraction of fact rows whose foreign key resolves in the dim's key
    set, as one report row (check='ref_integrity', column=``fk``). The dim
    collapses to distinct keys first; ``broadcast_dim`` pins the
    broadcast-hash shape for dims that fit (the usual case — a key set, not
    the dim's payload), else Catalyst picks a shuffled join."""
    keys = dim.select(F.col(pk).alias("__pk")).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    joined = fact.select(F.col(fk).alias("__fk")).join(
        keys, F.col("__fk") == F.col("__pk"), "left")
    return joined.agg(
        F.lit("ref_integrity").alias("check"),
        F.lit(fk).alias("column"),
        _ratio(F.count("__pk"), F.count(F.lit(1))).cast("double")
        .alias("observed"),
        F.lit(float(min_ratio)).alias("threshold"),
        (_ratio(F.count("__pk"), F.count(F.lit(1)))
         >= F.lit(min_ratio)).alias("passed"),
    ).select(*_REPORT_COLS)
