"""Fast driver↔executor row transfer for the bounded hybrid-finish pulls.

The hybrid driver finishes (SCC/dag_layers since round 8; CC/PageRank/PPR/
local-clustering since round 14) move a BOUNDED row set driver-side, compute
sequentially, and re-emit a DataFrame. Measured on this box (1.5k rows,
local[32]):

* ``spark.createDataFrame(list_of_tuples)`` → per-row verification + pickled
  rows fanned over defaultParallelism Python tasks: **2.3 s cold / 0.4 s warm**;
* ``spark.createDataFrame(pandas_df, schema)`` → Arrow batches read directly
  by the JVM: **0.4 s cold / 0.05 s warm**.

Same asymmetry on the pull side: ``collect()`` materializes heavyweight Row
objects; ``toPandas()`` ships Arrow batches when
``spark.sql.execution.arrow.pyspark.enabled`` is on (the engine session sets
it) and degrades to the row path — correct either way — on vanilla sessions.

Only FLAT schemas go through here (nested struct/array columns keep the
plain tuple path at their call sites — pandas→Arrow nested conversion has
its own type-coercion rules we don't want in the parity surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_rows_df(spark: SparkSession, rows: list[tuple],
                  schema: StructType) -> DataFrame:
    """Local rows → DataFrame via the Arrow/pandas path, falling back to the
    plain verified-tuples path if the conversion is unavailable (no pandas)
    or rejects the values. Result is value-identical either way — the
    fallback is the reference implementation."""
    if rows:
        try:
            import pandas as pd

            pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields],
                               dtype=object)
            return spark.createDataFrame(pdf, schema)
        except Exception:  # noqa: BLE001 — fall back to the verified path
            pass
    return spark.createDataFrame(rows, schema)


def collect_tuples(df: DataFrame) -> list[tuple]:
    """Bounded pull as plain tuples: ``toPandas()`` (Arrow batches when the
    session enables them) with element-wise conversion back to Python
    scalars, falling back to ``collect()``. Callers must already have
    bounded the row count (the hybrid-finish cutoff contract)."""
    try:
        pdf = df.toPandas()
        cols = [_to_py(pdf[c]) for c in pdf.columns]
        return list(zip(*cols)) if cols else []
    except Exception:  # noqa: BLE001
        return [tuple(r) for r in df.collect()]


def _to_py(series):
    """pandas column → list of plain Python scalars (object/str pass
    through; numpy ints/floats unbox so downstream dict keys, comparisons
    and arithmetic behave exactly like ``collect()``'s values)."""
    return [v.item() if hasattr(v, "item") else v for v in series.tolist()]
