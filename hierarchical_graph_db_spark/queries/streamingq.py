"""Streaming queries, hash-checked: watermarked event-time aggregates run to
completion (Trigger.AvailableNow → memory sink) and compared against DuckDB.

Most engines' streaming paths get only rows-only checks; here the drain is
deterministic (bounded input, complete mode), so the SQL oracle applies in
full — the strongest correctness statement available for the streaming layer.
Watermarks never drop rows in these runs (the data is replayed in one
micro-batch), so the oracle is the plain batch aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.queries import query
from hierarchical_graph_db_spark.streaming.ingest import (
    drain_to_dataframe,
    fixture_event_stream,
)
from hierarchical_graph_db_spark.streaming.windows import (
    session_counts,
    tumbling_counts,
)


@query(
    "streaming_tumbling_rollup",
    """
    SELECT date_trunc('hour', ts)              AS window_start,
           event_type,
           CAST(count(*) AS BIGINT)            AS n_events,
           round(sum(value), 2)                AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows with a 2h watermark, drained via AvailableNow;
    byte-for-byte the batch rollup once the stream is exhausted."""
    out = drain_to_dataframe(
        tumbling_counts(fixture_event_stream(spark, sf_dir), minutes=60)
    )
    return out.select("window_start", "event_type", "n_events", "total_value")


@query(
    "streaming_session_stats",
    """
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id,
           min(ts)                             AS session_start,
           max(ts) + INTERVAL 30 MINUTE        AS session_end,
           CAST(count(*) AS BIGINT)            AS n_events,
           round(sum(value), 2)                AS total_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window`` gap-merge sessions per user (30 min). Spark merges
    an event into a session iff it lands at-or-inside last_ts + gap
    (windows touching at an endpoint coalesce — verified empirically), so
    the oracle's island boundary is a strict ``gap > 30min``; session_end is
    last-event ts + gap, exactly Spark's window end."""
    out = drain_to_dataframe(
        session_counts(fixture_event_stream(spark, sf_dir), gap_minutes=30)
    )
    return out.select("user_id", "session_start", "session_end",
                      "n_events", "total_value")


@query(
    "streaming_dedup_keys",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` over the event stream keyed on
    (user_id, event_type): exactly one survivor per key. Which physical row
    survives is arrival-dependent, so the query emits the key set — which IS
    deterministic and equals the batch DISTINCT (the ST2 exactly-once-effects
    contract, now with bounded keyed state instead of a forever-index)."""
    from hierarchical_graph_db_spark.streaming.streams import dedup_within_watermark

    out = drain_to_dataframe(
        dedup_within_watermark(
            fixture_event_stream(spark, sf_dir), ["user_id", "event_type"]
        ),
        output_mode="append",
    )
    return out.select("user_id", "event_type")


@query(
    "streaming_interval_join",
    """
    SELECT p.user_id, p.ts, round(p.value, 2) AS purchase_value,
           c.ts AS ts_r, round(c.value, 2) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time band: every (purchase,
    click-within-10-min-before) pair, both sides watermarked so join state
    is bounded by watermark + band. Drained under AvailableNow the result is
    the exact batch interval join — hash-checked."""
    from hierarchical_graph_db_spark.streaming.streams import interval_join

    ev = fixture_event_stream(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = drain_to_dataframe(
        interval_join(purchases, clicks, on="user_id",
                      left_cols=["value"], right_cols=["value"]),
        output_mode="append",
    )
    return out.select(
        "user_id", "ts",
        F.round("value", 2).alias("purchase_value"),
        "ts_r",
        F.round("value_r", 2).alias("click_value"),
    )


@query(
    "streaming_interval_join_outer",
    """
    WITH p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
    wm AS (SELECT least((SELECT max(ts) FROM p),
                        (SELECT max(ts) FROM c)) AS w)
    SELECT p.user_id, p.ts, round(p.value, 2) AS purchase_value,
           c.ts AS ts_r, round(c.value, 2) AS click_value
    FROM p JOIN c ON c.user_id = p.user_id
       AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    UNION ALL
    SELECT p.user_id, p.ts, round(p.value, 2) AS purchase_value,
           CAST(NULL AS TIMESTAMP) AS ts_r,
           CAST(NULL AS DOUBLE) AS click_value
    FROM p CROSS JOIN wm
    WHERE p.ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
                      AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts)
    """,
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: matched (purchase, click)
    pairs plus null-joined purchases once the watermark proves no click can
    still arrive. Emission semantics are part of the oracle: an unmatched
    left row emits iff its event time is STRICTLY below the final global
    watermark min(max left ts, max right ts) — verified against an exact
    boundary row in tests/test_streaming.py — so even the watermark-
    eviction behavior is hash-checked, not just the matched pairs. The 0s
    watermark makes the bounded drain as complete as outer-join semantics
    allow; production uses a real horizon and trades completeness for
    late-data tolerance."""
    from hierarchical_graph_db_spark.streaming.streams import interval_join

    ev = fixture_event_stream(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = drain_to_dataframe(
        interval_join(purchases, clicks, on="user_id",
                      left_cols=["value"], right_cols=["value"],
                      watermark="0 seconds", how="left_outer"),
        output_mode="append",
    )
    return out.select(
        "user_id", "ts",
        F.round("value", 2).alias("purchase_value"),
        "ts_r",
        F.round("value_r", 2).alias("click_value"),
    )


@query(
    "streaming_interval_join_full_outer",
    """
    WITH p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
    wm AS (SELECT least((SELECT max(ts) FROM p),
                        (SELECT max(ts) FROM c)) AS w)
    SELECT p.user_id, p.ts, round(p.value, 2) AS purchase_value,
           c.ts AS ts_r, round(c.value, 2) AS click_value
    FROM p JOIN c ON c.user_id = p.user_id
       AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    UNION ALL
    SELECT p.user_id, p.ts, round(p.value, 2) AS purchase_value,
           CAST(NULL AS TIMESTAMP) AS ts_r,
           CAST(NULL AS DOUBLE) AS click_value
    FROM p CROSS JOIN wm
    WHERE p.ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
                      AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts)
    UNION ALL
    SELECT c.user_id, CAST(NULL AS TIMESTAMP) AS ts,
           CAST(NULL AS DOUBLE) AS purchase_value,
           c.ts AS ts_r, round(c.value, 2) AS click_value
    FROM c CROSS JOIN wm
    WHERE c.ts + INTERVAL 10 MINUTE < wm.w
      AND NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
                      AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 10 MINUTE)
    """,
)
def streaming_interval_join_full_outer(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: matched pairs plus BOTH
    sides' watermark-evicted unmatched rows. The two eviction predicates
    are asymmetric and both encoded in the oracle — an unmatched purchase
    emits iff ``p.ts < wm``, an unmatched click iff ``c.ts + band < wm``
    (the click's last possible matching purchase lives at ``c.ts + band``)
    — each pinned by a boundary row in tests/test_streaming.py."""
    from hierarchical_graph_db_spark.streaming.streams import interval_join

    ev = fixture_event_stream(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = drain_to_dataframe(
        interval_join(purchases, clicks, on="user_id",
                      left_cols=["value"], right_cols=["value"],
                      watermark="0 seconds", how="full_outer"),
        output_mode="append",
    )
    return out.select(
        "user_id", "ts",
        F.round("value", 2).alias("purchase_value"),
        "ts_r",
        F.round("value_r", 2).alias("click_value"),
    )


@query(
    "streaming_static_enrichment",
    """
    SELECT c.c_mktsegment, e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2)   AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriches against the customer
    dim (a plain batch DataFrame — broadcast, re-resolved per micro-batch)
    and aggregates by segment. No watermark needed: the static side never
    adds state, and the complete-mode aggregate over the drained stream
    equals the batch join — hash-checked. The canonical pattern for
    dimension lookup inside a 100 TB ingest stream."""
    from hierarchical_graph_db_spark.io import Catalog as _Cat

    ev = fixture_event_stream(spark, sf_dir)
    dim = _Cat(spark, sf_dir).customer.select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
    agg = (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = drain_to_dataframe(agg)
    return out.select("c_mktsegment", "event_type", "n_events", "total_value")


def _hll_oracle() -> str:
    from hierarchical_graph_db_spark.queries.sketchq import _sql_hll

    return _sql_hll(1024)


@query("streaming_hll_distinct", _hll_oracle())
def streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous distinct-count: the portable HLL register table
    (operators/sketches.py) maintained AS STREAMING STATE — ``groupBy(
    event_type, reg).max(rho)`` is an ordinary streaming aggregation, so
    the engine's state store carries at most groups × m register rows no
    matter how long the stream runs (contrast ``dropDuplicates``, whose
    state grows with the number of distinct keys). The drained registers
    fold to estimates batch-side (chained streaming aggregations aren't a
    thing; the fold input is ≤ groups × m rows). Register max is
    associative and commutative, so incremental micro-batch merging gives
    BIT-IDENTICAL registers to the batch sketch — the oracle is the same
    register replay as ``sketch_hll_distinct``, and the multi-batch
    incremental path is pinned in tests/test_streaming.py."""
    from hierarchical_graph_db_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    stream = fixture_event_stream(spark, sf_dir)
    regs = drain_to_dataframe(
        hll_registers(stream, "user_id", ["event_type"], m=1024))
    return hll_estimate(regs, ["event_type"], m=1024)


def _cms_stream_oracle() -> str:
    from hierarchical_graph_db_spark.queries.sketchq import _sql_cms_col

    return f"""
    WITH it AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
    rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
    cells AS (
        SELECT r, {_sql_cms_col('r', 'item', 64)} AS col, count(*) AS c
        FROM it CROSS JOIN rs GROUP BY 1, 2
    ),
    truth AS (SELECT item, CAST(count(*) AS BIGINT) AS true_n
              FROM it GROUP BY item),
    pc AS (
        SELECT t.item, rs.r, {_sql_cms_col('rs.r', 't.item', 64)} AS col
        FROM truth t CROSS JOIN rs
    ),
    est AS (
        SELECT pc.item, min(cells.c) AS est_n
        FROM pc JOIN cells ON cells.r = pc.r AND cells.col = pc.col
        GROUP BY pc.item
    )
    SELECT truth.item AS user_id, true_n, CAST(est_n AS BIGINT) AS est_n
    FROM truth JOIN est ON truth.item = est.item
    """


@query("streaming_cms_user_counts", _cms_stream_oracle())
def streaming_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous frequency estimation: the portable count-min grid
    (operators/sketches.py) maintained AS STREAMING STATE — the cell
    explode + ``groupBy(r, col).count`` is an ordinary streaming
    aggregation holding at most depth × width rows no matter how long the
    stream runs (the heavy-hitters companion to
    ``streaming_hll_distinct``; cell counts sum associatively across
    micro-batches, so the drained grid is bit-identical to the batch
    sketch). Estimates fold batch-side: every user probed against the
    drained grid beside their exact count — the full grid replay is the
    oracle, ``est_n >= true_n`` by construction."""
    from hierarchical_graph_db_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    stream = fixture_event_stream(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("item"))
    sketch = drain_to_dataframe(cms_build(stream, "item", width=64, depth=4))
    ev = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    truth = ev.select(F.col("user_id").cast("string").alias("item")) \
        .groupBy("item").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(sketch, truth.select("item"), "item",
                       width=64, depth=4)
    return (
        truth.join(est, "item")
        .select(F.col("item").alias("user_id"), "true_n",
                F.col("est_n").cast("long").alias("est_n"))
    )


@query(
    "streaming_window_topk",
    """
    WITH counts AS (
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY window_start
                                       ORDER BY n_events DESC, event_type)
                        AS rnk
          FROM counts) t
    WHERE rnk <= 3
    """,
)
def streaming_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour, streaming-first: the windowed
    counts are the STATEFUL streaming aggregate (watermarked tumbling
    window, state bounded by the watermark horizon); the rank runs on the
    drained result — the serving-side pattern (the store holds windowed
    aggregates, ranking is a query over windows, never stream state). Ties
    break on event_type, so the top-3 set is deterministic."""
    from pyspark.sql import Window

    counts = drain_to_dataframe(
        tumbling_counts(fixture_event_stream(spark, sf_dir), minutes=60)
    ).select("window_start", "event_type", "n_events")
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
    )


def _scd2_stream_oracle() -> str:
    from hierarchical_graph_db_spark.queries.timeseriesq import (
        _SQL_SCD2_HIST,
    )

    return f"""
    WITH {_SQL_SCD2_HIST}
    SELECT p.event_id, p.user_id, p.ts,
           h.event_type AS attr_at_ts,
           h.version
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN hist h ON h.user_id = p.user_id
                    AND h.valid_from <= p.ts
                    AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """


@query("streaming_scd2_enrichment", _scd2_stream_oracle())
def streaming_scd2_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature enrichment ON THE STREAM: purchase events
    stream in and LEFT stream-static join the SCD2 history (the batch-built
    dimension — static side) on user + half-open validity containment, so
    every purchase picks up the browsing state valid AT EVENT TIME with no
    look-ahead — the feature-store serving path as a streaming query. The
    dimension tiles each key's timeline without overlap (≤1 match per
    event), the join needs no watermark state (static side), and the
    drained append output must equal the batch point-in-time join — the
    oracle is the batch query verbatim."""
    from hierarchical_graph_db_spark.io import Catalog
    from hierarchical_graph_db_spark.operators.temporal import scd2_history

    ev = Catalog(spark, sf_dir).events
    hist = scd2_history(ev.where(F.col("event_type") != "purchase"),
                        key_col="user_id", attr_col="event_type",
                        ts_col="ts", tiebreak_col="event_id") \
        .select(F.col("user_id").alias("h_user"), "version",
                F.col("event_type").alias("attr_at_ts"),
                "valid_from", "valid_to")
    stream = (fixture_event_stream(spark, sf_dir)
              .where(F.col("event_type") == "purchase")
              .select("event_id", "user_id", "ts"))
    joined = stream.join(
        hist,
        (stream.user_id == hist.h_user)
        & (hist.valid_from <= stream.ts)
        & (hist.valid_to.isNull() | (stream.ts < hist.valid_to)),
        "left",
    )
    return drain_to_dataframe(
        joined.select("event_id", "user_id", "ts", "attr_at_ts", "version"),
        output_mode="append",
    )


def _incremental_oracle() -> str:
    from hierarchical_graph_db_spark.queries.dedup import INCREMENTAL_LSH_SQL

    return INCREMENTAL_LSH_SQL


@query("streaming_incremental_dedup", _incremental_oracle())
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS-ingest fuzzy dedup: the document stream (batch slice
    doc_id ≡ 7 mod 10 standing in for arriving files) probes the STATIC
    MinHash-LSH signature index of the existing corpus — the streaming twin
    of ``dedup_incremental_lsh``, same output row per new doc, same oracle.

    Stream-side signatures are ROW-LOCAL expressions (shingle array →
    two sha256 digests per shingle → 16 substring minima → 4 band keys),
    no per-doc aggregation before the join, so the only stateful operator
    is the final per-doc rollup — state bounded by in-flight batch keys,
    never corpus size. The static side (band index ⋈ shingle sets, the
    table a bulk dedup persists) broadcasts and is re-resolved per
    micro-batch, exactly like the SCD/static-enrichment patterns above.
    Jaccard verification is a row-local array intersect inside the joined
    stream. Lift of the reference's per-message content-hash dedup-upsert
    (``app/agents/parsing_agent.py:67``) to near-duplicate semantics.
    """
    from hierarchical_graph_db_spark.io import Catalog as _Cat
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        lsh_band_table,
        shingle_array_from_tokens,
        shingles,
    )
    from hierarchical_graph_db_spark.functions.hashing import normalized_text
    from hierarchical_graph_db_spark.functions.text import tokens
    from hierarchical_graph_db_spark.streaming.ingest import (
        fixture_document_stream,
    )

    n_hashes, bands, rows_per_band, threshold = 16, 4, 4, 0.5

    # ---- static index (what the initial bulk dedup persists) ----------
    existing = _Cat(spark, sf_dir).documents.where(F.col("doc_id") % 10 != 7)
    idx = lsh_band_table(existing).select(
        F.col("id").alias("eid"), "band", "band_key")
    se_sets = (
        shingles(existing)
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("shingle")).alias("se"))
        .select(F.col("id").alias("eid"), "se")
    )
    static_idx = idx.join(se_sets, on="eid")

    # ---- stream side: row-local signatures ----------------------------
    new = fixture_document_stream(spark, sf_dir).where(F.col("doc_id") % 10 == 7)
    toked = new.select(
        "doc_id", tokens(normalized_text(F.col("text"))).alias("toks"))
    base = toked.select(
        "doc_id",
        F.sort_array(F.array_distinct(
            shingle_array_from_tokens(F.col("toks"), 3))).alias("sn"),
    )
    # two digests per shingle (the chunked family: hash i = 8-hex window
    # i%8 of digest i//8), then 16 per-row minima — no groupBy. The
    # closures are built by factories, NOT `lambda x, i=i:` defaults —
    # F.transform dispatches on lambda ARITY, and a binary lambda receives
    # (element, array_index), silently shadowing the bound variable.
    def _digest(src: int):
        return lambda s: F.sha2(F.concat(F.lit(f"{src}#"), s), 256)

    def _window(i: int):
        return lambda h: F.substring(h, (i % 8) * 8 + 1, 8)

    digs = base.select(
        "doc_id", "sn",
        *[
            F.transform(F.col("sn"), _digest(src)).alias(f"d{src}")
            for src in range(n_hashes // 8)
        ],
    )
    mins = digs.select(
        "doc_id", "sn",
        *[
            F.array_min(F.transform(F.col(f"d{i // 8}"), _window(i)))
            .alias(f"m{i}")
            for i in range(n_hashes)
        ],
    )
    banded = mins.select(
        "doc_id", "sn",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[F.col(f"m{b * rows_per_band + r}")
                                   for r in range(rows_per_band)]).alias("band_key"),
            )
            for b in range(bands)
        ])).alias("bk"),
    ).select("doc_id", "sn", F.col("bk.band").alias("band"),
             F.col("bk.band_key").alias("band_key"))

    # ---- probe + row-local verify + single stateful rollup ------------
    joined = banded.join(F.broadcast(static_idx), on=["band", "band_key"],
                         how="left")
    common = F.size(F.array_intersect("sn", "se"))
    j = common / (F.size("sn") + F.size("se") - common)
    hit = F.col("eid").isNotNull() & (j >= threshold)
    agg = joined.groupBy("doc_id").agg(
        F.min(F.when(hit, F.col("eid"))).alias("dup_of"),
        F.round(F.max(F.when(hit, j)), 6).alias("best_jaccard"),
    )
    out = drain_to_dataframe(agg)
    return out.select(
        "doc_id", "dup_of", "best_jaccard",
        F.col("dup_of").isNotNull().alias("is_duplicate"),
    )
