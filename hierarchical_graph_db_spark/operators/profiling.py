"""Data-quality profiling: one-pass per-column statistics.

Training-data pipelines gate every ingest batch on a profile (null rates,
cardinalities, ranges drifting = upstream breakage). The profile is ONE
aggregation over the table — every column's stats are computed in the same
pass (no per-column scans), then melted to a long (column, stat) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats in one scan → (column, n_nulls, n_distinct,
    min_repr, max_repr) with values rendered to strings (mixed types in one
    output column need a common representation).

    ``n_distinct`` is exact (count_distinct) — at 100 TB swap for
    ``approx_count_distinct`` per the sketch-accuracy contract in
    ``queries/sketchq.py``.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    pairs = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_repr"),
                F.col(f"{c}__max").alias("max_repr"),
            )
            for c in cols
        ])
    ).alias("p")
    return wide.select(pairs).select("p.*")
