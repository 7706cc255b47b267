"""Temporal analytics operators: gap-fill resampling, funnels, snapshot diff.

Time-series post-processing the reference's declared analytics layer never
reached (README.md:86-88); standard warehouse/timeseries-DB surface
(TimescaleDB ``time_bucket_gapfill`` + ``locf``, funnel queries, CDC diffs),
re-expressed as Catalyst plans:

* ``resample_gapfill`` — regularize a sparse series onto a fixed grid per
  key (``sequence`` + explode), left-join observations, forward-fill with
  ``last(ignorenulls)`` — the LOCF (last-observation-carried-forward) shape.
* ``funnel`` — ordered-step conversion (step N counts only at/after the
  user's step N-1 time): chained conditional min-aggregates, one shuffle per
  step, all on the same join key.
* ``snapshot_diff`` — CDC between two snapshots of the same table: full
  outer join on the key, null-safe column compare → added/removed/changed.

Scale notes: every stage is keyed by the entity column — aggregates combine
map-side and all joins are equi-joins on that key, so the shapes survive a
1000-executor shuffle. Gap-fill's grid explode generates ≤ (span/step) rows
per key — bounded by wall-clock span, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     step: str = "1 hour",
                     trailing: int | None = None) -> DataFrame:
    """LOCF resampling: per key, a dense ``step`` grid from its first to last
    bucket; missing buckets carry the last observed reading forward.

    The per-bucket observation is the LAST reading by event time (requires
    (key, ts) unique — true of any event stream with a tiebroken timestamp;
    the fixture guarantees it). Returns (key, bucket, reading, gap_filled).

    ``trailing`` bounds the RESULT shape to each key's last N buckets — the
    dashboard-window consumption shape (a chart reads a recent window, not
    a key's whole history). The LOCF window still runs over the key's FULL
    grid before the filter (carry-forward seeds from observations older
    than the window are preserved; a filter on a non-partition column
    cannot be pushed through the window function), so fill semantics are
    identical — only the emitted rows shrink from O(keys·span) to
    O(keys·N). ``None`` returns the full grid.
    """
    # Grid alignment requires a whole-unit step: buckets are date_trunc'd to
    # the unit and the grid strides by the step, so any sub-unit step (e.g.
    # "30 minutes") would produce off-stride buckets that never join — a
    # silent data drop. Enforce instead of document.
    parts = step.split()
    allowed = ("minute", "hour", "day", "week", "month")
    if len(parts) != 2 or parts[0] != "1" or parts[1].rstrip("s") not in allowed:
        raise ValueError(
            f"step must be a whole unit ('1 minute'/'1 hour'/'1 day'/...), "
            f"got {step!r}"
        )
    unit = parts[1].rstrip("s")
    bucket = F.date_trunc(unit, F.col(ts_col))
    obs = (
        events.groupBy(F.col(key_col), bucket.alias("bucket"))
        .agg(F.max_by(value_col, F.col(ts_col)).alias("obs_reading"))
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            key_col,
            "hi",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {step}"))
            ).alias("bucket"),
        )
    )
    joined = grid.join(obs, on=[key_col, "bucket"], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        F.col(key_col),
        F.col("bucket"),
        F.col("hi"),
        F.round(F.last("obs_reading", ignorenulls=True).over(w), 2)
        .alias("reading"),
        F.col("obs_reading").isNull().alias("gap_filled"),
    )
    if trailing is not None:
        # Enforce, don't document (the step-parameter stance above):
        # trailing ≤ 0 would build "interval -1 <unit>" and silently
        # return an empty frame instead of the caller's mistake.
        if trailing < 1:
            raise ValueError(f"trailing must be >= 1 bucket, got {trailing!r}")
        filled = filled.where(
            F.col("bucket") >= F.col("hi") - F.expr(
                f"interval {trailing - 1} {unit}")
        )
    return filled.drop("hi")


def funnel(events: DataFrame, steps: list[str],
           key_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered-step funnel: step i's timestamp is the user's first ``steps[i]``
    event at/after their step i-1 timestamp (classic strictly-ordered
    conversion semantics — a click before the first view doesn't convert).

    Output: one row per key that completed step 1, with ``<step>_ts`` per
    step (null once the funnel breaks) and ``steps_completed``. Each step is
    one filtered conditional min-aggregate plus an equi-join on the key —
    |steps| shuffles, all on the same key, no windows over the raw stream.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias(f"{steps[0]}_ts"))
    )
    prev_ts = f"{steps[0]}_ts"
    for step in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == step)
            .join(cur.select(key_col, prev_ts), on=key_col)
            .where(F.col(ts_col) >= F.col(prev_ts))
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(f"{step}_ts"))
        )
        cur = cur.join(nxt, on=key_col, how="left")
        prev_ts = f"{step}_ts"
    completed = F.lit(1)
    for step in steps[1:]:
        completed = completed + F.when(
            F.col(f"{step}_ts").isNotNull(), 1
        ).otherwise(0)
    return cur.select(
        key_col,
        *[f"{s}_ts" for s in steps],
        completed.cast("long").alias("steps_completed"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """CDC diff of two snapshots: rows added / removed / changed (unchanged
    rows are dropped — at scale that's ~all of them, so the output is the
    delta, not the table).

    Full outer equi-join on the key; change detection is a null-safe
    column-wise compare (NULL→value and value→NULL count as changes).
    Output: key cols, change_type, then old_<c>/new_<c> per compare col.
    """
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),  # presence marker: key cols may be NULL
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = [F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}")) for k in key_cols]
    j = o.join(n, on=cond, how="full_outer")
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type") != "unchanged")
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in key_cols
            ],
            "change_type",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )


def scd2_history(events: DataFrame, key_col: str = "user_id",
                 attr_col: str = "event_type", ts_col: str = "ts",
                 tiebreak_col: str = "event_id") -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history build (Kimball's public
    warehouse pattern): collapse each key's attribute timeline into
    versioned validity ranges — one row per consecutive run of equal
    ``attr_col`` values: (key, version, attr, valid_from, valid_to,
    is_current, n_events). ``valid_to`` is the next version's
    ``valid_from`` (half-open ranges, the standard SCD2 contract); the
    open-ended run has ``valid_to = NULL`` and ``is_current = true``.

    Scale shape: gaps-and-islands over a (key)-partitioned window ordered
    by (ts, tiebreak) — per-key state only, no global sort — then one hash
    aggregate per (key, version) whose partials collapse map-side, and a
    second per-key window for the ``lead``. All three stages share the one
    key-hash shuffle (co-partitioned); deterministic because the tiebreak
    column makes the within-key order total."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(attr_col).over(w)
    runs = (
        events.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn(
            "chg",
            F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0))
        .withColumn("version", F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    grouped = (
        runs.groupBy(key_col, "version")
        .agg(F.min(attr_col).alias(attr_col),
             F.min(ts_col).alias("valid_from"),
             F.count(F.lit(1)).alias("n_events"))
    )
    w2 = Window.partitionBy(key_col).orderBy("version")
    return (
        grouped.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, "version", attr_col, "valid_from", "valid_to",
                "is_current", "n_events")
    )


def point_in_time_join(probe: DataFrame, history: DataFrame, key_col: str,
                       ts_col: str = "ts", valid_from: str = "valid_from",
                       valid_to: str = "valid_to") -> DataFrame:
    """Point-in-time (as-of) join of a probe table against an SCD2 history:
    each probe row picks up the attribute version valid at its timestamp —
    the feature-store correctness pattern (no look-ahead leakage when
    assembling training sets). Versions are half-open
    [valid_from, valid_to) with a NULL-ended current row, and per key they
    tile the timeline without overlap, so each probe row matches at most
    one version — no dedup pass needed after the join.

    Scale shape: an equi-join on the key with the range predicate as the
    join residual — both sides shuffle ONCE on the key hash and the range
    check runs inside the co-partitioned match (never a cartesian or a
    range-join explosion; history rows per key = version count, small by
    construction). Contrast the generic as-of join (operators/asof.py),
    which handles the no-history-table case; here the SCD2 build has
    already collapsed the timeline, so the probe join is cheaper than
    re-deriving last-value-before per probe row."""
    h = history.select(
        F.col(key_col).alias("__k"), F.col(valid_from).alias("__vf"),
        F.col(valid_to).alias("__vt"),
        *[c for c in history.columns
          if c not in (key_col, valid_from, valid_to)],
    )
    cond = (
        (probe[key_col] == h["__k"])
        & (h["__vf"] <= probe[ts_col])
        & (h["__vt"].isNull() | (probe[ts_col] < h["__vt"]))
    )
    return probe.join(h, cond, "left").drop("__k", "__vf", "__vt")


def u_shaped_attribution(purchases: DataFrame, clicks: DataFrame,
                         band_hours: int = 4) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the standard
    marketing-analytics credit model (public practice: 40% first touch,
    40% last, 20% split across middles; degenerate cases 1 touch → 100%,
    2 → 50/50). Each purchase's clicks within the preceding ``band_hours``
    (inclusive at BOTH edges) are ranked by (ts, click_id) and credited;
    credit is fixed-point ppm and credited value cent-micros so no float
    summation enters a cross-engine hash.

    Inputs: ``purchases(purchase_id, user_id, p_ts, value)`` and
    ``clicks(click_id, c_uid, c_ts)``. Scale shape: the touch join is a
    user-keyed interval join (per-user bounded work); position rank and
    touch count are windows partitioned by the PURCHASE — bounded by its
    touch count, never corpus-wide. Extracted from the
    ``attribution_position_based`` registry query so randomized inputs
    can drive it directly (round-14 property layer)."""
    touches = purchases.join(
        clicks, (F.col("user_id") == F.col("c_uid"))
        & F.col("c_ts").between(
            F.col("p_ts") - F.expr(f"interval {band_hours} hours"),
            F.col("p_ts")))
    w = Window.partitionBy("purchase_id")
    ranked = (
        touches
        .withColumn("pos", F.row_number().over(
            w.orderBy("c_ts", "click_id")).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(w).cast("long"))
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")),
              F.lit(400000))
        .otherwise(F.round(F.lit(200000.0) / (F.col("n") - 2)))
    ).cast("bigint")
    return ranked.select(
        "purchase_id", "click_id", "pos", "n",
        credit.alias("credit_ppm"),
        (F.round(F.col("value") * 100).cast("bigint") * credit)
        .alias("credit_value_micros"),
    )


def rolling_zscore(events: DataFrame, id_col: str = "event_id",
                   key_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value", hours: int = 72,
                   min_n: int = 5) -> DataFrame:
    """Trailing-time-horizon z-score (streaming-style anomaly detection in
    batch form): each row scored against its key's trailing ``hours``
    distribution — a RANGE frame over microsecond event time, so the
    window is a time horizon, not a row count, and rows SHARING a
    timestamp are mutual peers regardless of within-tie order (standard
    SQL RANGE-frame peer semantics — the boundary the property test
    pins). |z| > 3 flags the outlier; rows with fewer than ``min_n``
    trailing events are suppressed (no stable baseline). One window pass
    per key. Extracted from the ``anomaly_rolling_zscore`` registry query
    (round 14) so randomized inputs can drive it."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(ts_col))  # full precision — no frame drift
        .rangeBetween(-hours * 3600 * 1_000_000, 0)
    )
    z = ((F.col(value_col) - F.avg(value_col).over(w))
         / F.stddev_samp(value_col).over(w))
    return (
        events.select(
            id_col,
            (F.round(z, 4) + F.lit(0.0)).alias("zscore"),  # -0.0 → 0.0
            (F.abs(z) > 3.0).alias("is_anomaly"),
            F.count(F.lit(1)).over(w).alias("_n"),
        )
        .where(F.col("_n") >= min_n)
        .drop("_n")
    )


def rolling_distinct_counts(events: DataFrame, key_col: str = "event_type",
                            ts_col: str = "ts", id_col: str = "user_id",
                            days: int = 7,
                            epoch: str = "2024-01-01") -> DataFrame:
    """Trailing-``days`` distinct ids per key at daily grain — the classic
    NON-decomposable rolling metric (distinct doesn't merge across days).
    Daily id *sets* aggregate first (one shuffle, |days|×|keys| rows),
    then a RANGE frame over the day NUMBER unions ``days`` sets and
    counts — the frame is a calendar horizon, so days missing from the
    data are correctly absent rather than stretching the window (the
    ROWS-frame bug a property test pins). State is bounded by
    days×daily-distinct, never the raw stream. Extracted from the
    ``window_rolling_distinct_users`` registry query (round 14)."""
    daily = (
        events.select(
            key_col,
            F.date_trunc("day", ts_col).alias("day"),
            id_col,
        )
        .groupBy(key_col, "day")
        .agg(F.collect_set(id_col).alias("ids"))
        .withColumn("day_num",
                    F.datediff("day", F.lit(epoch).cast("timestamp")))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day_num")
        .rangeBetween(-(days - 1), 0)
    )
    return daily.select(
        key_col, "day",
        F.size(F.array_distinct(F.flatten(F.collect_list("ids").over(w))))
        .cast("long").alias(f"ids_{days}d"),
    )
