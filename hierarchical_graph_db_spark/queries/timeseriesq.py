"""Time-series queries over ``events``: as-of/range joins, gap-fill
resampling, funnels, snapshot CDC.

DuckDB oracles use its native ASOF JOIN / interval predicates / IGNORE NULLS
windows, so these are true cross-engine differential tests of the operators
in ``operators/asof.py`` and ``operators/temporal.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.asof import asof_join, range_join
from hierarchical_graph_db_spark.operators.temporal import (
    funnel,
    resample_gapfill,
    scd2_history,
    snapshot_diff,
)
from hierarchical_graph_db_spark.queries import query


@query(
    "asof_join_last_click",
    """
    SELECT p.event_id,
           p.user_id,
           p.ts,
           round(p.value, 2)  AS purchase_value,
           c.ts               AS ts_right,
           round(c.value, 2)  AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase: the user's most recent click at-or-before it.
    Union+window implementation — one shuffle on user_id, no range scan."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, clicks, on=["user_id"], ts_col="ts",
                    right_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("purchase_value"),
        "ts_right",
        F.round("value_right", 2).alias("click_value"),
    )


@query(
    "range_join_views_before_purchase",
    """
    SELECT p.event_id,
           CAST(count(v.event_id) AS BIGINT) AS n_views_10m
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    GROUP BY p.event_id
    """,
)
def range_join_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: views by the same user in the 10 minutes before each
    purchase. Equi-key (user_id) sort-merge with an interval filter — the
    quadratic work is bounded per user, the minimum for interval semantics."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    pairs = range_join(purchases, views, on=["user_id"], ts_col="ts",
                       lower_interval="interval 10 minutes", how="left")
    return pairs.groupBy("event_id").agg(
        F.count("event_id_r").cast("long").alias("n_views_10m")
    )


@query(
    "resample_gapfill_hourly",
    """
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               arg_max(value, ts) AS obs_reading
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, hi,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM span
    ),
    locf AS (
        SELECT g.user_id, g.bucket, g.hi,
               round(last_value(o.obs_reading IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS reading,
               o.obs_reading IS NULL AS gap_filled
        FROM grid g LEFT JOIN obs o
          ON o.user_id = g.user_id AND o.bucket = g.bucket
    )
    SELECT user_id, bucket, reading, gap_filled
    FROM locf WHERE bucket >= hi - INTERVAL 167 HOUR
    """,
)
def resample_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill (TimescaleDB ``time_bucket_gapfill``+``locf`` shape):
    per user, a dense hourly grid from first to last activity; missing hours
    carry the last observed reading forward. The emitted rows are each
    user's trailing 7 days (168 hourly buckets) — the dashboard-window
    consumption shape — while LOCF still runs over the full span first, so
    carry-forward seeds older than the window are preserved; bounds the
    result to O(users·168) instead of O(users·span) (VERDICT r8 item 4)."""
    return resample_gapfill(Catalog(spark, sf_dir).events, trailing=168)


@query(
    "funnel_view_click_purchase",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS view_ts
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS click_ts
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.view_ts
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS purchase_ts
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.click_ts
        WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CAST(1 + CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS steps_completed
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view→click→purchase: step i counts
    only at/after the user's step i-1 time. Chained conditional
    min-aggregates, every shuffle on user_id."""
    return funnel(Catalog(spark, sf_dir).events,
                  steps=["view", "click", "purchase"])


#: Snapshot-CDC scenario constants (baked into both engines): snapshot A
#: drops event_id ≡ 0 (mod 10), snapshot B drops ≡ 0 (mod 13) and doubles
#: value where ≡ 0 (mod 7) — yielding adds, removes, AND changes.
_CDC_OLD = "SELECT event_id, event_type, value FROM events WHERE event_id % 10 <> 0"
_CDC_NEW = (
    "SELECT event_id, event_type, "
    "CASE WHEN event_id % 7 = 0 THEN round(value * 2, 2) ELSE value END AS value "
    "FROM events WHERE event_id % 13 <> 0"
)


@query(
    "snapshot_cdc_diff",
    f"""
    WITH o AS ({_CDC_OLD}), n AS ({_CDC_NEW})
    SELECT coalesce(o.event_id, n.event_id) AS event_id,
           CASE WHEN o.event_id IS NULL THEN 'added'
                WHEN n.event_id IS NULL THEN 'removed'
                WHEN o.value IS DISTINCT FROM n.value
                  OR o.event_type IS DISTINCT FROM n.event_type THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           o.event_type AS old_event_type, o.value AS old_value,
           n.event_type AS new_event_type, n.value AS new_value
    FROM o FULL OUTER JOIN n ON o.event_id = n.event_id
    WHERE NOT (o.event_id IS NOT NULL AND n.event_id IS NOT NULL
               AND o.value IS NOT DISTINCT FROM n.value
               AND o.event_type IS NOT DISTINCT FROM n.event_type)
    """,
)
def snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two event-table snapshots (synthesized deterministically
    from the fixture): full outer equi-join on the key, null-safe compare →
    added/removed/changed delta rows only."""
    ev = Catalog(spark, sf_dir).events
    old = ev.where(F.col("event_id") % 10 != 0).select(
        "event_id", "event_type", "value"
    )
    new = ev.where(F.col("event_id") % 13 != 0).select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.round(F.col("value") * 2, 2))
        .otherwise(F.col("value")).alias("value"),
    )
    return snapshot_diff(old, new, key_cols=["event_id"],
                         compare_cols=["event_type", "value"])


@query(
    "ewma_user_value",
    """
    SELECT event_id,
           round(list_sum(list_transform(l, (x, i) -> x * pow(0.7, len(l) - i)))
                 / list_sum(list_transform(l, (x, i) -> pow(0.7, len(l) - i))),
                 5) AS ewma
    FROM (
        SELECT event_id,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS l
        FROM events
    )
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.3, adjust-normalized) of each user's value stream. The
    recursion is inherently sequential state — not a Catalyst window frame —
    so it runs per-user in ``applyInPandas`` (operators/grouped.ewma_values);
    the DuckDB oracle recomputes the closed form Σ(1-α)^j·x / Σ(1-α)^j with
    a list lambda over the same (ts, event_id)-ordered prefix."""
    from hierarchical_graph_db_spark.operators.grouped import ewma_values

    return ewma_values(Catalog(spark, sf_dir).events, alpha=0.3)


@query(
    "user_retention_cohorts",
    """
    WITH firstw AS (
        SELECT user_id,
               min(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               date_diff('day', f.cohort_week,
                         CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7
                   AS week_offset
        FROM events e JOIN firstw f ON e.user_id = f.user_id
    )
    SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    as active per weeks-since-cohort. First-seen is one hash aggregate on
    user_id; the activity join shuffles on the same key (co-partitioned —
    no extra exchange); the (cohort, offset) matrix is tiny. The week
    offset is computed as day-difference // 7 of week-truncated stamps —
    identical integer arithmetic on both engines (no engine-specific
    week-boundary-crossing counters)."""
    ev = Catalog(spark, sf_dir).events
    week = F.date_trunc("week", F.col("ts"))
    firstw = (
        ev.select("user_id", week.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = (
        ev.select("user_id", week.alias("w"))
        .join(firstw, "user_id")
        .select(
            "user_id", "cohort_week",
            F.floor(F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@query(
    "ohlc_hourly_bars",
    """
    WITH ordered AS (
        SELECT event_type, date_trunc('hour', ts) AS bar, value,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_open,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM events
    )
    SELECT event_type, bar,
           round(min(CASE WHEN rn_open = 1 THEN value END), 2)  AS open,
           round(max(value), 2)                                 AS high,
           round(min(value), 2)                                 AS low,
           round(min(CASE WHEN rn_close = 1 THEN value END), 2) AS close,
           CAST(count(*) AS BIGINT)                             AS n_events
    FROM ordered
    GROUP BY event_type, bar
    """,
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical time-series
    downsample. First/last values come from row_number flags folded into
    the same hash aggregate as high/low/count (no second pass, no
    engine-specific arg_min/arg_max semantics: the (ts, event_id)
    tie-break is explicit and identical in both engines)."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    bar = F.date_trunc("hour", F.col("ts"))
    w_open = Window.partitionBy("event_type", bar).orderBy("ts", "event_id")
    w_close = Window.partitionBy("event_type", bar).orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    ordered = ev.select(
        "event_type", bar.alias("bar"), "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ordered.groupBy("event_type", "bar").agg(
        F.round(F.min(F.when(F.col("rn_open") == 1, F.col("value"))), 2)
        .alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.min(F.when(F.col("rn_close") == 1, F.col("value"))), 2)
        .alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "twap_user_daily",
    """
    WITH spans AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
               CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)) -
                    epoch_us(ts) AS DOUBLE) / 1000000.0 AS hold_sec
        FROM events
    )
    SELECT user_id, day,
           round(sum(value * hold_sec) / sum(hold_sec), 4) AS twap,
           CAST(count(*) AS BIGINT) AS n_spans
    FROM spans
    WHERE hold_sec IS NOT NULL AND hold_sec > 0
    GROUP BY user_id, day
    """,
)
def twap_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user-day: each observation is
    weighted by how long it 'held' (until the user's next event) — the
    TWAP/VWAP family, where a plain avg over irregular samples is biased
    toward bursts. One lead() window pass per user, then a hash aggregate;
    the last span of each user (no successor) is open-ended and excluded
    in both engines."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hold = (
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
        .cast("double") / 1_000_000.0
    )
    spans = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day"), "value",
        hold.alias("hold_sec"),
    ).where(F.col("hold_sec").isNotNull() & (F.col("hold_sec") > 0))
    return spans.groupBy("user_id", "day").agg(
        F.round(F.sum(F.col("value") * F.col("hold_sec")) / F.sum("hold_sec"), 4)
        .alias("twap"),
        F.count(F.lit(1)).alias("n_spans"),
    )


@query(
    "nearest_event_join",
    """
    WITH pairs AS (
        SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
               c.event_id AS click_id, c.ts AS click_ts,
               abs(epoch_us(c.ts) - epoch_us(p.ts)) AS dist_us,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
                            c.ts, c.event_id) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE
                      AND p.ts + INTERVAL 10 MINUTE
    )
    SELECT purchase_id, purchase_ts, click_id, click_ts,
           CAST(dist_us AS BIGINT) AS dist_us
    FROM pairs WHERE rn = 1
    """,
)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-in-time join: each purchase pairs with its closest
    click within ±10 minutes (either direction — the symmetric complement
    of the as-of join's last-before semantics). The band predicate keeps
    the join banded exactly like the interval join; a per-purchase window
    takes the minimum |Δt| with a deterministic (ts, event_id) tie-break."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"), F.col("user_id").alias("p_user"))
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"), F.col("user_id").alias("c_user"))
    band = F.expr("INTERVAL 10 MINUTES")
    dist = F.abs(F.unix_micros("click_ts") - F.unix_micros("purchase_ts"))
    w = Window.partitionBy("purchase_id").orderBy(
        dist, "click_ts", "click_id")
    return (
        p.join(c, (F.col("c_user") == F.col("p_user"))
               & (F.col("click_ts") >= F.col("purchase_ts") - band)
               & (F.col("click_ts") <= F.col("purchase_ts") + band))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("purchase_id", "purchase_ts", "click_id", "click_ts",
                dist.cast("long").alias("dist_us"))
    )


@query(
    "scd2_user_type_history",
    """
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    r AS (
        SELECT user_id, event_type, ts,
               sum(CASE WHEN prev IS NULL OR prev <> event_type
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version
        FROM o
    ),
    g AS (
        SELECT user_id, CAST(version AS BIGINT) AS version,
               min(event_type) AS event_type, min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_events
        FROM r GROUP BY user_id, version
    )
    SELECT user_id, version, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           IS NULL AS is_current,
           n_events
    FROM g
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history of each user's event_type timeline: versioned
    half-open validity ranges with an open current row — the Kimball
    dimension-versioning pattern as one co-partitioned plan (islands window
    + map-side-partial run aggregate + lead window, all on the user_id
    shuffle)."""
    ev = Catalog(spark, sf_dir).events
    return scd2_history(ev, key_col="user_id", attr_col="event_type",
                        ts_col="ts", tiebreak_col="event_id")


#: SCD2 history of each user's NON-purchase activity as an oracle CTE
#: chain ending in hist(user_id, version, event_type, valid_from,
#: valid_to, n_events) — the browsing-state dimension the point-in-time
#: join consumes (excluding purchases keeps the probe out of its own
#: history, so the joined attribute is informative, not self-matching).
_SQL_SCD2_HIST = """
    o AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type <> 'purchase'
    ),
    r AS (
        SELECT user_id, event_type, ts,
               sum(CASE WHEN prev IS NULL OR prev <> event_type
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version
        FROM o
    ),
    g AS (
        SELECT user_id, CAST(version AS BIGINT) AS version,
               min(event_type) AS event_type, min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_events
        FROM r GROUP BY user_id, version
    ),
    hist AS (
        SELECT user_id, version, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to
        FROM g
    )
"""


@query(
    "scd2_point_in_time_join",
    f"""
    WITH {_SQL_SCD2_HIST}
    SELECT p.event_id, p.user_id, p.ts,
           h.event_type AS attr_at_ts,
           h.version
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN hist h ON h.user_id = p.user_id
                    AND h.valid_from <= p.ts
                    AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time correctness: every purchase picks up
    the user's NON-purchase activity run (their browsing state) that was
    valid AT PURCHASE TIME from the SCD2 history — the no-look-ahead join
    a training-set assembler needs
    (operators/temporal.py:point_in_time_join). Excluding purchases from
    the history keeps the probe out of its own dimension, so the joined
    attribute carries signal; purchases before any activity left-join to
    nulls. SCD2 versions tile each user's timeline half-open without
    overlap, so the equi-join on user_id with the range residual matches
    at most one version per probe row: both sides shuffle once on the
    key, no dedup pass, no range-join explosion."""
    from hierarchical_graph_db_spark.operators.temporal import (
        point_in_time_join,
        scd2_history,
    )

    ev = Catalog(spark, sf_dir).events
    hist = scd2_history(ev.where(F.col("event_type") != "purchase"),
                        key_col="user_id", attr_col="event_type",
                        ts_col="ts", tiebreak_col="event_id") \
        .select("user_id", "version", "event_type", "valid_from", "valid_to")
    probe = ev.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    joined = point_in_time_join(probe, hist, key_col="user_id")
    return joined.select(
        "event_id", probe["user_id"].alias("user_id"), "ts",
        F.col("event_type").alias("attr_at_ts"), "version",
    )


@query(
    "attribution_position_based",
    """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, ts
        FROM events WHERE event_type = 'click'
    ),
    touches AS (
        SELECT p.purchase_id, p.value, c.click_id,
               CAST(row_number() OVER (PARTITION BY p.purchase_id
                                       ORDER BY c.ts, c.click_id)
                    AS BIGINT) AS pos,
               CAST(count(*) OVER (PARTITION BY p.purchase_id)
                    AS BIGINT) AS n
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.ts BETWEEN p.ts - INTERVAL 4 HOUR AND p.ts
    )
    SELECT purchase_id, click_id, pos, n,
           CAST(CASE WHEN n = 1 THEN 1000000
                     WHEN n = 2 THEN 500000
                     WHEN pos = 1 OR pos = n THEN 400000
                     ELSE CAST(round(200000.0 / (n - 2)) AS BIGINT)
                END AS BIGINT) AS credit_ppm,
           CAST(round(value * 100) AS BIGINT)
               * CASE WHEN n = 1 THEN 1000000
                      WHEN n = 2 THEN 500000
                      WHEN pos = 1 OR pos = n THEN 400000
                      ELSE CAST(round(200000.0 / (n - 2)) AS BIGINT)
                 END AS credit_value_micros
    FROM touches
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the standard
    marketing-analytics credit model (public practice: 40% first touch,
    40% last, 20% split across middles; degenerate cases 1 touch → 100%,
    2 → 50/50): each purchase's clicks within the preceding 4 hours
    are ranked and credited, with credit in fixed-point ppm and
    credited value in cent-micros so no float summation enters the hash.
    Plan shape: the touch join is the user-keyed interval join (per-user
    bounded work); position rank and touch count are windows partitioned
    by the PURCHASE (bounded by its touch count, never corpus-wide).
    Credit model extracted to ``operators/temporal.py:u_shaped_attribution``
    (round 14) so the property layer can drive it with randomized
    purchase/click tables."""
    from hierarchical_graph_db_spark.operators.temporal import (
        u_shaped_attribution,
    )

    ev = Catalog(spark, sf_dir).events
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"), "value")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"))
    return u_shaped_attribution(p, c, band_hours=4)


def _holt_oracle(alpha: float = 0.5, beta: float = 0.3) -> str:
    """DuckDB twin of operators.grouped.holt_level_trend: the same fold via
    ``list_reduce`` over the (ts, event_id)-ordered value list, with the
    α/β complements injected through ``repr`` so both engines iterate with
    bit-identical doubles (fuzz-verified exact)."""
    a, oma = repr(alpha), repr(1.0 - alpha)
    g, omg = repr(beta), repr(1.0 - beta)
    lv = f"{a} * e[1] + {oma} * (acc[1] + acc[2])"
    return f"""
    WITH lists AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id
    ),
    st AS (
        SELECT user_id, CAST(len(l) AS BIGINT) AS n,
               list_reduce(
                   list_transform(l, x -> [CAST(x AS DOUBLE),
                                           CAST(0 AS DOUBLE)]),
                   (acc, e) -> [
                       {lv},
                       {g} * (({lv}) - acc[1]) + {omg} * acc[2]
                   ]) AS s
        FROM lists
    )
    SELECT user_id, n,
           round(s[1], 5) AS level,
           round(s[2], 5) AS trend,
           round(s[1] + s[2], 5) AS forecast
    FROM st
    """


@query("holt_level_trend_forecast", _holt_oracle())
def holt_level_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing per user (α=0.5, β=0.3): final level,
    trend, and one-step forecast over each value stream — the trend-aware
    upgrade of EWMA for metric forecasting. Sequential 2-state fold in
    ``applyInPandas`` (operators/grouped.py:holt_level_trend); the oracle
    replays it with a ``list_reduce`` lambda, bit-identical doubles."""
    from hierarchical_graph_db_spark.operators.grouped import (
        holt_level_trend,
    )

    return holt_level_trend(Catalog(spark, sf_dir).events)


@query(
    "seasonal_decompose_hourly",
    """
    WITH base AS (
        SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS hod,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    lvl AS (
        SELECT event_type,
               CAST(sum(cents) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY event_type
    ),
    seas AS (
        SELECT event_type, hod,
               CAST(sum(cents) AS BIGINT) AS htot,
               CAST(count(*) AS BIGINT) AS hn
        FROM base GROUP BY event_type, hod
    )
    SELECT s.event_type, s.hod, s.hn,
           round(l.tot / 100.0 / l.n, 4) AS level,
           round(s.htot / 100.0 / s.hn - l.tot / 100.0 / l.n, 4)
               AS seasonal,
           round((s.htot / 100.0 / s.hn)
                 / (l.tot / 100.0 / l.n), 6) AS seasonal_index
    FROM seas s JOIN lvl l ON s.event_type = l.event_type
    """,
)
def seasonal_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition, hour-of-day period, per event
    type: level (grand mean), additive seasonal component (hour mean −
    level) and the multiplicative seasonal index (hour mean / level) —
    the moving-average-free form of the classical decomposition
    (seasonal-means method, public textbook). All means are exact-integer
    cent sums divided once, so no float-summation order exists; two
    map-side-collapsing aggregates, output |types| × 24 rows."""
    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hod"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    lvl = ev.groupBy("event_type").agg(
        F.sum("cents").cast("bigint").alias("tot"),
        F.count(F.lit(1)).alias("n"))
    seas = ev.groupBy("event_type", "hod").agg(
        F.sum("cents").cast("bigint").alias("htot"),
        F.count(F.lit(1)).alias("hn"))
    level = F.col("tot") / 100.0 / F.col("n")
    hmean = F.col("htot") / 100.0 / F.col("hn")
    return (
        seas.join(F.broadcast(lvl), "event_type")
        .select("event_type", "hod", "hn",
                F.round(level, 4).alias("level"),
                F.round(hmean - level, 4).alias("seasonal"),
                F.round(hmean / level, 6).alias("seasonal_index"))
    )


@query(
    "kpi_week_over_week",
    """
    WITH weekly AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS DATE) AS week,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, n_events,
           round(cents / 100.0, 2) AS revenue,
           round((cents - lag(cents) OVER w)
                 / CAST(lag(cents) OVER w AS DOUBLE), 6) + 0 AS wow_change,
           round(avg(cents / 100.0) OVER (PARTITION BY event_type
                                          ORDER BY week
                                          ROWS BETWEEN 3 PRECEDING
                                                   AND CURRENT ROW), 4)
               AS ma4
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
)
def kpi_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI staple: weekly revenue per event type with week-over-week
    percent change and a 4-week trailing moving average. Weekly sums are
    exact integer cents (map-side collapse); the windows run over the
    |types| × |weeks| aggregate table, never the fact. The trailing avg
    divides a ≤4-term sum — rounded at 4dp where partial order can't
    bite."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    weekly = (ev.groupBy(
        "event_type",
        F.date_trunc("week", "ts").cast("date").alias("week"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .cast("bigint").alias("cents"),
             F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy("event_type").orderBy("week")
    ma = w.rowsBetween(-3, 0)
    return weekly.select(
        "event_type", "week", "n_events",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        (F.round((F.col("cents") - F.lag("cents").over(w))
                 / F.lag("cents").over(w).cast("double"), 6)
         + F.lit(0.0)).alias("wow_change"),
        F.round(F.avg(F.col("cents") / 100.0).over(ma), 4).alias("ma4"),
    )
