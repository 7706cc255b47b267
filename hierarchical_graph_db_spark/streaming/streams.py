"""Stateful stream relational ops: watermarked dedup and stream-stream joins.

The reference's queue gives at-least-once delivery with an index making
re-inserts no-ops (SURVEY.md §2.8 ST2); these are the two Spark-native
stateful stream primitives that generalize it:

* ``dedup_within_watermark`` — ``dropDuplicatesWithinWatermark``: exactly
  one output row per key among duplicates arriving within the watermark
  horizon. State is keyed and evicted at the horizon — bounded by churn,
  not stream length (the scale contract the reference's unique index can't
  make, since Mongo keeps every key forever).
* ``interval_join`` — stream-stream inner join with an event-time band
  (right row within ``[left.ts - lower, left.ts]`` on the same key). Both
  sides watermark; Spark derives state retention from the band, so join
  state is bounded by (watermark + band) per key.

Both drain deterministically under Trigger.AvailableNow on bounded input,
so they join the hash-checked oracle registry (the strongest check a
streaming layer can get) rather than rows-only smoke.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(events: DataFrame, key_cols: list[str],
                           ts_col: str = "ts",
                           watermark: str = "2 hours") -> DataFrame:
    """One row per key among duplicates within the watermark horizon.

    Output carries only the key columns: WHICH physical row survives is
    arrival-order-dependent (first seen), but the surviving key set is
    exactly the distinct key set — the deterministic contract callers (and
    the oracle) rely on.
    """
    deduped = (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
    return deduped.select(*key_cols)


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  ts_col: str = "ts", band: str = "10 minutes",
                  watermark: str = "2 hours",
                  left_cols: list[str] | None = None,
                  right_cols: list[str] | None = None,
                  how: str = "inner") -> DataFrame:
    """Stream-stream join: right rows on the same key with
    ``right.ts ∈ [left.ts - band, left.ts]``.

    Both sides are watermarked so Spark bounds the join state: a buffered
    row is droppable once the other side's watermark passes its band edge.
    Column names: left keeps its names, right's are suffixed ``_r``.

    ``how='left_outer'`` additionally emits unmatched left rows (right
    columns null) once the watermark proves no future match can arrive —
    the streaming twin of a batch left join, with the caveat that rows
    still inside the final watermark horizon when the stream drains are
    held in state, never emitted (standard Structured Streaming outer-join
    semantics; with a short watermark on bounded input the drained result
    is the full batch left join minus the horizon tail).
    """
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = (
        right.select(
            F.col(on).alias(f"{on}_r"),
            F.col(ts_col).alias(f"{ts_col}_r"),
            *[F.col(c).alias(f"{c}_r") for c in (right_cols or [])],
        )
        .withWatermark(f"{ts_col}_r", watermark)
        .alias("r")
    )
    cond = (
        (F.col(on) == F.col(f"{on}_r"))
        & (F.col(f"{ts_col}_r") >= F.col(ts_col) - F.expr(f"interval {band}"))
        & (F.col(f"{ts_col}_r") <= F.col(ts_col))
    )
    joined = lw.join(rw, cond, how)
    # For right/full outer, unmatched right rows carry the key only on the
    # _r side — surface one coalesced key column either way.
    key = (F.coalesce(F.col(on), F.col(f"{on}_r")).alias(on)
           if how in ("full_outer", "right_outer", "outer", "full")
           else F.col(on))
    keep = [key, ts_col, *(left_cols or []),
            f"{ts_col}_r", *[f"{c}_r" for c in (right_cols or [])]]
    return joined.select(*keep)
