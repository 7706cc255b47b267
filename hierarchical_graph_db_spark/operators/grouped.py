"""Grouped pandas UDF operators (``applyInPandas``).

The escape hatch for per-group math Catalyst can't express: each group
arrives as one pandas DataFrame (Arrow transfer), runs arbitrary Python, and
returns rows. Shape rules at 100 TB: the groupBy *is* the shuffle — one pass,
hash-partitioned on the key; a single group must fit one executor's memory
(true for per-user/per-doc groups, NOT for global ones — never key on a
constant).

``user_value_trend`` is deliberately also expressible in SQL
(``regr_slope``), so the Python path gets a hash-checked DuckDB oracle —
the pattern to copy for model-scoring UDFs whose contract can be mirrored
relationally on synthetic data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


TREND_SCHEMA = "user_id long, n_events long, slope double"


def _trend(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user OLS slope of value over event time (seconds).

    Centered formulation (cov/var on demeaned x) — numerically identical to
    SQL ``regr_slope``; None when variance is zero (single instant)."""
    x = pdf["ts_sec"].astype("float64")
    y = pdf["value"].astype("float64")
    n = len(pdf)
    xc = x - x.mean()
    var = (xc * xc).sum()
    slope = None if var == 0.0 else float((xc * (y - y.mean())).sum() / var)
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n_events": [n],
         "slope": [None if slope is None else round(slope, 6)]}
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """value-over-time trend per user via ``applyInPandas``."""
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id", F.col("ts").cast("long").alias("ts_sec"), "value"
    )
    return prepped.groupBy("user_id").applyInPandas(_trend, schema=TREND_SCHEMA)


def _ewma(alpha: float):
    """Per-group EWMA (adjust=True closed form) via the num/den recursion:
    num_t = x_t + (1-α)·num_{t-1}; den_t = 1 + (1-α)·den_{t-1}; y = num/den.
    Mathematically Σ(1-α)^j·x_{t-j} / Σ(1-α)^j — the bounded-weight form
    whose oracle is a list-lambda in DuckDB. Rounded to 5dp so the two
    engines' summation orders can't flip the hash."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        decay = 1.0 - alpha
        num = 0.0
        den = 0.0
        out = []
        for x in pdf["value"].astype("float64"):
            num = x + decay * num
            den = 1.0 + decay * den
            out.append(round(num / den, 5))
        return pd.DataFrame({"event_id": pdf["event_id"], "ewma": out})

    return fn


def ewma_values(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per user.

    The recursion is order-dependent state — the one window shape Catalyst
    can't express (no recursive frames) — so it runs as ``applyInPandas``:
    the groupBy(user_id) IS the shuffle, each user's history streams through
    one Arrow batch in event-time order. At 100 TB the per-group invariant
    holds (a user's events fit an executor); never key this on a constant.
    """
    from pyspark.sql import functions as F

    prepped = events.select("user_id", "ts", "event_id", "value")
    return prepped.groupBy("user_id").applyInPandas(
        _ewma(alpha), schema="event_id long, ewma double"
    )
