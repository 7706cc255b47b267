"""Event sessionization + time-window rollups (batch forms).

The streaming equivalents (``session_window``/``window`` + watermark) live in
``streaming/windows.py``; these batch forms are gaps-and-islands window
functions, fully SQL-expressible, and serve as the semantic oracle for the
streaming path (SURVEY.md §2.8 — the reference has no event-time windows at
all; these are north-star additions on ``events``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user: a gap > ``gap_minutes`` starts a session.

    Classic gaps-and-islands: lag → boundary flag → running sum. Two window
    passes over the same (user_id | ts) partitioning — one shuffle total.
    Boundary semantics pinned to Spark's ``session_window`` (verified
    empirically, batch AND streaming): an event at EXACTLY last_ts + gap is
    MERGED into the session (windows touching at an endpoint coalesce), so a
    new session requires a strict ``>`` gap. This keeps the batch form a true
    semantic oracle for the streaming path
    (tests/test_sessionize_similarity.py pins the boundary).
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    return with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn(
        "session_id",
        F.concat_ws("-", F.col("user_id").cast("string"), F.col("session_seq").cast("string")),
    ).drop("new_session")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregate: event count, span seconds, total value."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .alias("span_seconds"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def tumbling_rollup(events: DataFrame, unit: str = "hour") -> DataFrame:
    """Tumbling event-time window aggregate via date_trunc (batch form)."""
    return events.groupBy(
        F.date_trunc(unit, F.col("ts")).alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )
