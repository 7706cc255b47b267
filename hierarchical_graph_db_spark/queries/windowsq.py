"""Event-time windowing queries (batch forms of SURVEY.md §2.8 north-star).

The reference's Celery stream has no event-time semantics; tumbling windows
and sessionization are the additions. These batch forms double as the
semantic oracles for streaming/windows.py (same results, micro-batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.sessionize import (
    session_stats,
    tumbling_rollup,
)
from hierarchical_graph_db_spark.queries import query


@query(
    "hourly_event_rollup",
    """
    SELECT date_trunc('hour', ts)                  AS window_start,
           event_type,
           CAST(count(*) AS BIGINT)                AS n_events,
           round(sum(value), 2)                    AS total_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form; the streaming twin
    uses window('ts','1 hour') + watermark and must produce these rows)."""
    return tumbling_rollup(Catalog(spark, sf_dir).events, unit="hour")


@query(
    "session_stats",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN CAST(floor(epoch_ms(ts) / 1000) AS BIGINT)
                         - lag(CAST(floor(epoch_ms(ts) / 1000) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT *,
               CAST(user_id AS VARCHAR) || '-' ||
               CAST(sum(new_session) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS VARCHAR)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(CAST(floor(epoch_ms(ts) / 1000) AS BIGINT))
                - min(CAST(floor(epoch_ms(ts) / 1000) AS BIGINT)) AS BIGINT)
               AS span_seconds,
           round(sum(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def session_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) via gaps-and-islands windows — the batch
    oracle for the streaming session_window path."""
    return session_stats(Catalog(spark, sf_dir).events, gap_minutes=30)


@query(
    "window_range_frame_trailing_sum",
    """
    SELECT event_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 2) AS trailing_1h_value
    FROM events
    """,
)
def window_range_frame_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: each event's trailing-1-hour value sum per user —
    the frame is value-based (seconds), not row-count-based, so sparse and
    dense activity periods get the same time horizon."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        # microsecond precision: ts.cast("long") truncates to whole seconds,
        # which silently widens the frame for events whose true age is just
        # past the boundary (diverges from the oracle's INTERVAL frame)
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("trailing_1h_value"),
    )


@query(
    "window_lag_lead_ntile",
    """
    SELECT event_id,
           round(value - lag(value) OVER w_ts, 2) + 0  AS delta_prev,
           round(lead(value) OVER w_ts - value, 2) + 0 AS delta_next,
           CAST(ntile(4) OVER w_ts AS BIGINT)      AS session_quartile,
           round(percent_rank() OVER (PARTITION BY user_id
                                      ORDER BY value, event_id), 6)
               AS value_pct_rank
    FROM events
    WINDOW w_ts AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation/distribution window functions in one pass per ordering:
    lag/lead deltas and ntile over the time order, percent_rank over the
    value order — the remaining window-function families (§2 full relational
    surface) beyond frames/top-k/running totals."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        (F.round(F.col("value") - F.lag("value").over(w_ts), 2)
         + F.lit(0.0)).alias("delta_prev"),
        (F.round(F.lead("value").over(w_ts) - F.col("value"), 2)
         + F.lit(0.0)).alias("delta_next"),
        F.ntile(4).over(w_ts).cast("long").alias("session_quartile"),
        F.round(F.percent_rank().over(w_val), 6).alias("value_pct_rank"),
    )


@query(
    "anomaly_rolling_zscore",
    """
    SELECT event_id,
           round((value - avg(value) OVER trail)
                 / stddev_samp(value) OVER trail, 4) + 0 AS zscore,
           abs((value - avg(value) OVER trail)
               / stddev_samp(value) OVER trail) > 3.0 AS is_anomaly
    FROM events
    WINDOW trail AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 72 HOUR PRECEDING AND CURRENT ROW)
    QUALIFY count(*) OVER trail >= 5
    """,
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection in batch form: each event scored
    against its user's trailing-72-hour distribution (RANGE frame — time
    horizon, not row count); |z| > 3 flags the outlier. Rows with fewer
    than 5 trailing events are suppressed (no stable baseline). One window
    pass per user. Scoring extracted to
    ``operators/temporal.py:rolling_zscore`` (round 14) so the property
    layer can drive it with randomized streams."""
    from hierarchical_graph_db_spark.operators.temporal import (
        rolling_zscore,
    )

    return rolling_zscore(Catalog(spark, sf_dir).events,
                          hours=72, min_n=5)


@query(
    "sliding_window_rollup",
    """
    WITH expanded AS (
        SELECT t.ws AS window_start, event_type, value
        FROM events,
             unnest([
                 time_bucket(INTERVAL '15 minutes', ts),
                 time_bucket(INTERVAL '15 minutes', ts) - INTERVAL 15 MINUTE,
                 time_bucket(INTERVAL '15 minutes', ts) - INTERVAL 30 MINUTE,
                 time_bucket(INTERVAL '15 minutes', ts) - INTERVAL 45 MINUTE
             ]) AS t(ws)
    )
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS total_value
    FROM expanded
    GROUP BY window_start, event_type
    """,
)
def sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (60 min length / 15 min slide) windows in BATCH mode via
    ``F.window`` — each event expands to 4 overlapping windows at the
    source, then one aggregation. The oracle unnests the same 4 computed
    window starts per event. (Streaming twin: streaming/windows.py
    sliding_counts.)"""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            F.window("ts", "60 minutes", "15 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "window_rolling_median",
    """
    SELECT event_id,
           round(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 10 PRECEDING AND CURRENT ROW),
                 5) AS rolling_median
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing median (11-row frame) per user — the order statistic
    Spark's windows don't ship natively. The frame materializes as a sorted
    array (collect_list + array_sort over the ROWS frame, ≤11 elements — a
    bounded-size state, safe at any corpus scale) and the median reads out
    with the even/odd interpolation DuckDB's ``median()`` applies. The
    unique event_id tiebreak makes the frame deterministic in both engines."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid = F.floor((n + 1) / 2).cast("int")
    half = F.floor(n / 2).cast("int")
    med = F.when(
        n % 2 == 1, F.element_at(arr, mid)
    ).otherwise(
        (F.element_at(arr, half) + F.element_at(arr, half + 1)) / 2.0
    )
    return ev.select("event_id", F.round(med, 5).alias("rolling_median"))


@query(
    "window_rolling_distinct_users",
    """
    WITH daily AS (
        SELECT DISTINCT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts))
                   AS day_num,
               user_id
        FROM events
    )
    SELECT event_type, day,
           CAST(count(DISTINCT user_id)
                OVER (PARTITION BY event_type ORDER BY day_num
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS users_7d
    FROM daily
    QUALIFY row_number() OVER (PARTITION BY event_type, day ORDER BY user_id) = 1
    """,
)
def window_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per event type at daily grain — the
    classic non-decomposable rolling metric (distinct doesn't merge across
    days). Daily user *sets* aggregate first (one shuffle, |days|×|types|
    rows), then a RANGE frame unions 7 sets and counts: state is bounded by
    7×daily-distinct, never the raw event stream. DuckDB cross-checks with
    its native windowed count(DISTINCT). Set-union rollup extracted to
    ``operators/temporal.py:rolling_distinct_counts`` (round 14) so the
    property layer can drive it with randomized gapped calendars."""
    from hierarchical_graph_db_spark.operators.temporal import (
        rolling_distinct_counts,
    )

    ev = Catalog(spark, sf_dir).events
    return rolling_distinct_counts(
        ev, key_col="event_type", ts_col="ts", id_col="user_id", days=7
    ).withColumnRenamed("ids_7d", "users_7d")


@query(
    "events_value_histogram",
    """
    WITH bounds AS (
        SELECT min(value) AS vmin, max(value) AS vmax,
               CASE WHEN max(value) = min(value) THEN 1.0
                    ELSE max(value) - min(value) END AS vspan
        FROM events
    )
    SELECT event_type,
           CAST(least(floor((value - vmin) * 20.0 / vspan), 19)
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events, bounds
    GROUP BY event_type, bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of event values per type. The global
    [min,max] bounds are a 1-row aggregate broadcast back onto the scan
    (never a driver collect), the bucket index is pure arithmetic folded
    into the map side, and the histogram itself is one hash aggregate —
    the two-pass shape that survives any scale. Identical float expression
    order on both engines keeps boundary values in the same bucket. The
    span falls back to 1.0 when vmax == vmin (all-equal column) so a
    degenerate distribution lands in bucket 0 instead of NaN — same CASE
    guard as drift_psi_value, mirrored in the oracle."""
    ev = Catalog(spark, sf_dir).events
    bounds = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.when(F.max("value") == F.min("value"), F.lit(1.0))
        .otherwise(F.max("value") - F.min("value"))
        .alias("vspan"),
    )
    bucket = F.least(
        F.floor((F.col("value") - F.col("vmin")) * 20.0 / F.col("vspan")),
        F.lit(19),
    ).cast("long")
    return (
        ev.join(F.broadcast(bounds))
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "events_equidepth_bins",
    """
    WITH binned AS (
        SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS bin
        FROM events
    )
    SELECT event_type, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_events,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM binned GROUP BY event_type, bin
    """,
)
def events_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning per event type — the histogram dual of
    the equi-width bucket query: ntile assigns equal-population deciles
    (deterministic tie-break on event_id), then per-bin bounds and counts
    come from one hash aggregate. The decile boundary table is what a
    cost-based optimizer or drift monitor consumes."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("bin"))
        .groupBy("event_type", F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@query(
    "session_event_paths",
    """
    WITH flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN CAST(floor(epoch_ms(ts) / 1000) AS BIGINT)
                         - lag(CAST(floor(epoch_ms(ts) / 1000) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, event_type, ts, event_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_seq,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 25
    """,
)
def session_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the ordered event-type path of each 30-min
    session, counted across sessions — the product-analytics staple on top
    of the same gaps-and-islands sessionization the session_stats family
    pins. The path string materializes per session (bounded by session
    length), then one hash aggregate ranks journeys."""
    from hierarchical_graph_db_spark.operators.sessionize import sessionize

    ev = Catalog(spark, sf_dir).events
    sess = sessionize(ev, gap_minutes=30)
    paths = (
        sess.groupBy("user_id", "session_seq")
        .agg(F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(25)
    )


@query(
    "event_transition_matrix",
    """
    WITH steps AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    counts AS (
        SELECT src, dst, count(*) AS n
        FROM steps WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           round(n / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
    FROM counts
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types within user
    streams: P(next=dst | cur=src). One lead() pass builds the bigrams,
    one hash aggregate counts them, and the row-normalization reuses the
    counted matrix (|types|² rows) — the fact is scanned exactly once."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    row_tot = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n",
        F.round(F.col("n") / F.sum("n").over(row_tot).cast("double"), 6)
        .alias("p"),
    )


@query(
    "window_distribution_functions",
    """
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, sum_cents,
           round(cume_dist() OVER w, 6) AS cdist,
           nth_value(user_id, 2) OVER wf AS second_user,
           first_value(user_id) OVER wf  AS min_user,
           last_value(user_id) OVER wf   AS max_user
    FROM per_user
    WINDOW w  AS (PARTITION BY event_type ORDER BY sum_cents, user_id),
           wf AS (PARTITION BY event_type ORDER BY sum_cents, user_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    """,
)
def window_distribution_functions(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The remaining distribution/navigation window functions in one pass:
    cume_dist over each type's per-user spend order, plus
    nth_value/first_value/last_value over the explicit full-partition frame
    (the frame spec matters — the default frame would make last_value the
    running row). One shuffle; both windows share the (event_type) ×
    (sum_cents, user_id) sort."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint").alias("sum_cents"))
    w = Window.partitionBy("event_type").orderBy("sum_cents", "user_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_user.select(
        "event_type", "user_id", "sum_cents",
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("user_id", 2).over(wf).alias("second_user"),
        F.first("user_id").over(wf).alias("min_user"),
        F.last("user_id").over(wf).alias("max_user"),
    )


def _stationary_oracle(n_iter: int = 12) -> str:
    """DuckDB twin of the Markov stationary query: the transition-count
    build, then ``n_iter`` unrolled power-iteration CTEs with the same
    fixed-point bigint contribution sums as the engine loop (damping 1.0 —
    pure x' = xP), then an exact-integer normalization."""
    iters = []
    prev = "s0"
    for i in range(1, n_iter + 1):
        iters.append(f"""
    s{i} AS MATERIALIZED (
        SELECT v.id, round(coalesce(c.s, 0), 6) AS score
        FROM vertices v
        LEFT JOIN (
            SELECT e.dst AS id,
                   sum(CAST(round(p.score * e.weight / e.outw * 1000000)
                            AS BIGINT)) / 1000000.0 AS s
            FROM ew e JOIN s{i - 1} p ON e.src = p.id
            GROUP BY e.dst
        ) c ON v.id = c.id
    )""")
        prev = f"s{i}"
    return f"""
    WITH steps AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    edges AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS weight
        FROM steps WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    vertices AS (SELECT DISTINCT src AS id FROM edges),
    outw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS outw
             FROM edges GROUP BY src),
    ew AS MATERIALIZED (
        SELECT e.src, e.dst, e.weight, o.outw
        FROM edges e JOIN outw o ON e.src = o.src
    ),
    s0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS score FROM vertices),
    {','.join(iters)},
    num AS (
        SELECT id, CAST(round(score * 1000000) AS BIGINT) AS num
        FROM {prev}
    )
    SELECT id AS event_type,
           round(num / CAST((SELECT sum(num) FROM num) AS DOUBLE), 6) AS p
    FROM num
    """


@query("event_transition_stationary", _stationary_oracle())
def event_transition_stationary(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — where user
    activity settles in the long run — by 12 rounds of power iteration
    x' = xP over the transition graph (the damping-free case of the
    engine's weighted TextRank loop: same per-round keyed join + hash
    aggregate with fixed-point bigint sums, state = |event types| rows).
    The exact-integer normalization makes the final probabilities
    order-independent; every iteration unrolls into the oracle. States
    must have outgoing transitions (true of any observed event stream;
    absorbing states would need the dangling-mass PageRank form)."""
    from pyspark.sql import Window

    from hierarchical_graph_db_spark.operators.graph import weighted_textrank

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    edges = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))
    scores = weighted_textrank(edges, n_iter=12, damping=1.0)
    num = scores.select("id", F.round(F.col("score") * 1000000)
                        .cast("bigint").alias("num"))
    total = num.agg(F.sum("num").alias("t"))
    return (
        num.crossJoin(F.broadcast(total))
        .select(F.col("id").alias("event_type"),
                F.round(F.col("num") / F.col("t").cast("double"), 6)
                .alias("p"))
    )


@query(
    "transition_dwell_times",
    """
    WITH steps AS (
        SELECT event_type AS src,
               lead(event_type) OVER w AS dst,
               CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT)
                   AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
           round(sum(gap_us) / count(*) / 1000000.0, 4) AS mean_gap_s,
           round(min(gap_us) / 1000000.0, 4) AS min_gap_s,
           round(max(gap_us) / 1000000.0, 4) AS max_gap_s
    FROM steps WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
)
def transition_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time per event-type transition — how long users linger on
    src before moving to dst (mean/min/max gap seconds per directed
    pair): the temporal companion to the transition-probability matrix.
    Gaps are exact integer microseconds summed before ONE division, so
    the means are order-independent; one lead() pass + one hash
    aggregate."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
        .alias("gap_us"),
    ).where(F.col("dst").isNotNull())
    return steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("gap_us") / F.count(F.lit(1)) / 1000000.0, 4)
        .alias("mean_gap_s"),
        F.round(F.min("gap_us") / 1000000.0, 4).alias("min_gap_s"),
        F.round(F.max("gap_us") / 1000000.0, 4).alias("max_gap_s"),
    )


@query(
    "funnel_conversion_latency",
    """
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT c.c_mktsegment AS segment,
               CAST(epoch_us(fp) - epoch_us(fv) AS BIGINT) AS gap_us
        FROM f JOIN customer c ON f.user_id = c.c_custkey
        WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(gap_us, 0.5) / 60000000.0, 4) AS p50_min,
           round(quantile_cont(gap_us, 0.9) / 60000000.0, 4) AS p90_min,
           round(max(gap_us) / 60000000.0, 4) AS max_min
    FROM conv GROUP BY segment
    """,
)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per customer segment: exact median /
    p90 / max of the first-view → first-purchase gap — the latency
    companion to the ordered-funnel counts. Gaps are exact integer
    microseconds (first events via min-CASE in ONE pass over the fact);
    the dim broadcasts; percentiles run per segment over one row per
    converted user."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("fp"))
    dim = cat.customer.select(F.col("c_custkey").alias("user_id"),
                              F.col("c_mktsegment").alias("segment"))
    conv = (f.join(F.broadcast(dim), "user_id")
            .where(F.col("fv").isNotNull() & F.col("fp").isNotNull()
                   & (F.col("fp") >= F.col("fv")))
            .select("segment",
                    (F.unix_micros("fp") - F.unix_micros("fv"))
                    .alias("gap_us")))
    return conv.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(gap_us, 0.5)") / 60000000.0, 4)
        .alias("p50_min"),
        F.round(F.expr("percentile(gap_us, 0.9)") / 60000000.0, 4)
        .alias("p90_min"),
        F.round(F.max("gap_us") / 60000000.0, 4).alias("max_min"),
    )
