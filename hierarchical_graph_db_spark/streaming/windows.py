"""Watermarked event-time windows over a streaming ``events`` source.

Reference parity note: the reference has **no** event-time windowing at all
(SURVEY.md §2.8 — late/dirty data is simply kept with null dates). These are
the north-star streaming aggregates, built only from Spark primitives:
``window()``, ``session_window()``, ``withWatermark()``. The batch twins in
``operators/sessionize.py`` are the semantic oracle for tests.

Scale: streaming state is keyed by (window, event_type) / (user, session) —
state store size is bounded by the watermark horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    minutes: int = 60,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{minutes} minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    length_minutes: int = 60,
    slide_minutes: int = 15,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding (overlapping) windows — each event lands in length/slide
    windows; Spark expands them at the source, no custom logic."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(
                F.col(ts_col),
                f"{length_minutes} minutes",
                f"{slide_minutes} minutes",
            ).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based) — the streaming twin of
    ``operators.sessionize.session_stats``; state closes once the watermark
    passes the session gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("win"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
