"""Grouped pandas UDF operators (``applyInPandas``) — hot-key-safe forms.

The escape hatch for per-group math Catalyst can't express. Shape rules at
100 TB: the groupBy *is* the shuffle, BUT a pandas group is one Arrow batch
that must fit executor memory — so nothing here ever feeds a UDF a whole
per-key history. Sequential recurrences are parallel-prefix-decomposed:

- :func:`ewma_values` — the EWMA linear recurrence runs as chunk-local
  prefixes in pure Catalyst (scaled cumulative sums inside bounded chunks)
  plus a per-user carry scan over CHUNK SUMMARIES (one row per chunk, not
  per event) in ``applyInPandas``. A key with 10⁸ events puts ≤ chunk_size
  rows in any window frame's in-memory batch and ≤ 10⁸/chunk_size summary
  rows in the scan group — both bounded, where the old whole-history group
  was an OOM.
- :func:`user_value_trend` — OLS moments are algebraically aggregable, so
  they reduce map-side in Catalyst (centered two-pass form: raw moments
  would cancel catastrophically at ts ≈ 1.7e9); the pandas UDF receives
  ONE moment row per user (the model-scoring seam stays a grouped UDF,
  its input no longer scales with history length).

``user_value_trend`` is deliberately also expressible in SQL, so the
Python path gets a hash-checked DuckDB oracle — the pattern to copy for
model-scoring UDFs whose contract can be mirrored relationally.
Cross-engine determinism: a plain ``sum(xc·yc)`` over doubles is
partition-order dependent, and at larger scale per-user slopes shrink
toward 1e-6 where the 6dp output rounding has a single digit of signal —
sf1 exposed a last-ulp sum divergence flipping one user's rounded slope
vs DuckDB's ``regr_slope``. Both sides therefore sum FIXED-POINT cells:
means from exact bigint sums (x is epoch seconds as int64; y quantized
to 6dp cells), then sxy in 3dp cells and sxx in integer cells —
``floor(·+0.5)`` of identical IEEE doubles, summed as int64, is
partitioning- and engine-independent. Cell scales are chosen for int64
headroom: |xc| ≤ ts-span/2, |yc| ≤ max|value|, so sxy cells stay exact
doubles (< 2^53) and the per-user sums stay < 2^63 up to ~10M events per
user; quantization shifts the slope by ≤ ~1e-9 relative — far below the
6dp output rounding.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize


TREND_SCHEMA = "user_id long, n_events long, slope double"

#: Grouped-UDF bucket fan-out. Per-GROUP Arrow/pandas overhead in
#: ``applyInPandas`` is ~2-3 ms (measured round 10: 15k single-user groups
#: cost 41 s of pure framework tax at sf1); grouping by a hash bucket
#: instead of the user id puts ~n_users/256 users in one vectorized batch
#: and amortizes that overhead away, while each task still holds only the
#: bucket's SUMMARY rows (O(1) per user) — the hot-key contract is
#: untouched because per-user row counts don't change, only how many
#: users share a Python batch. 256 ≫ any realistic core count, so
#: cluster parallelism is preserved.
_UDF_BUCKETS = 256


def _bucketed(df: DataFrame, key: str = "user_id") -> DataFrame:
    return df.withColumn(
        "_b", F.pmod(F.hash(F.col(key)), F.lit(_UDF_BUCKETS)))


def _slope_from_moments(pdf: pd.DataFrame) -> pd.DataFrame:
    """Finalize the OLS slope from pre-aggregated centered moments.

    One input row per user (sxy = Σ(x-x̄)(y-ȳ), sxx = Σ(x-x̄)²), MANY users
    per pandas batch (hash-bucket grouping) — the grouped-UDF seam where a
    real pipeline would run model scoring, in its batch-scoring shape.
    The arithmetic is vectorized float64, element-wise identical IEEE ops
    to the old one-user-at-a-time form (hash-stable)."""
    sxx = pdf["sxx_cells"].astype("float64").to_numpy()
    sxy = pdf["sxy_cells"].astype("float64").to_numpy()
    # sxx == 0 (constant-ts user) must surface as SQL NULL — per-element
    # Python floats + None in an object column, exactly the old scalar
    # path's types through the Arrow boundary
    slope = [
        None if x == 0.0
        else math.floor((y / 1000.0) / x * 1000000.0 + 0.5) / 1000000.0
        for x, y in zip(sxx, sxy)
    ]
    return pd.DataFrame(
        {"user_id": pdf["user_id"].astype("int64"),
         "n_events": pdf["n_events"].astype("int64"),
         "slope": pd.Series(slope, dtype=object, index=pdf.index)}
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user OLS slope of value over event time (seconds).

    Centered two-pass formulation — numerically identical to SQL
    ``regr_slope`` (raw moments would cancel catastrophically at
    ts ≈ 1.7e9): pass 1 aggregates per-user means (map-side combine),
    pass 2 re-joins them (co-partitioned on user_id) and aggregates the
    centered cross-moments, and the grouped UDF finalizes slope from the
    single moment row. No stage holds more than O(1) rows per user in
    Python — hot keys reduce map-side in Catalyst."""
    prepped = events.select(
        "user_id", F.col("ts").cast("long").alias("ts_sec"), "value"
    )
    means = prepped.groupBy("user_id").agg(
        F.sum("ts_sec").alias("sx"),  # exact int64 — order-free
        F.sum(F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)))
        .alias("sy_cells"),
        F.count(F.lit(1)).alias("n_events"),
    )
    mx = F.col("sx") / F.col("n_events")
    my = (F.col("sy_cells") / F.lit(1000000.0)) / F.col("n_events")
    xc = F.col("ts_sec").cast("double") - mx
    yc = F.col("value").cast("double") - my
    moments = (
        prepped.join(means, on="user_id")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(xc * yc * F.lit(1000.0) + F.lit(0.5)))
            .alias("sxy_cells"),
            F.sum(F.floor(xc * xc + F.lit(0.5))).alias("sxx_cells"),
            F.first("n_events").alias("n_events"),
        )
    )
    # hash-bucket grouping: ~n_users/256 moment rows per pandas batch —
    # same per-user math, ~250× fewer Arrow group round-trips (the
    # per-group overhead dominated at sf1: 15k single-user groups ≈ 2.8 ms
    # each of pure framework tax, PLANS.md §Round-10)
    return _bucketed(moments).groupBy("_b").applyInPandas(
        _slope_from_moments, schema=TREND_SCHEMA
    )


def _ewma_carry_scan(d: float):
    """Per-user sequential scan over CHUNK SUMMARIES (one row per chunk):
    carry-in state for chunk i is the end-of-chunk-(i-1) global (num, den)
    of the recursion num' = x + d·num, den' = 1 + d·den. The pandas batch
    holds MANY users' summaries (hash-bucket grouping — the per-group
    Arrow overhead of one-user groups dominated the whole query at sf1);
    state resets at each user boundary of the (user_id, chunk_id)-sorted
    batch, so the per-user arithmetic sequence is byte-identical to the
    one-user-per-group form. Rows per user = n_events/chunk_size —
    bounded even for a 10⁸-event hot key; rows per batch = that ×
    (n_users / _UDF_BUCKETS)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "chunk_id"], kind="mergesort")
        s_num = 0.0
        s_den = 0.0
        prev_user = None
        out_num = []
        out_den = []
        for uid, num_end, den_end, ln in zip(
            pdf["user_id"],
            pdf["num_end"].astype("float64"),
            pdf["den_end"].astype("float64"),
            pdf["chunk_len"],
        ):
            if uid != prev_user:
                s_num = 0.0
                s_den = 0.0
                prev_user = uid
            out_num.append(s_num)
            out_den.append(s_den)
            dk = d ** int(ln)
            s_num = num_end + dk * s_num
            s_den = den_end + dk * s_den
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "chunk_id": pdf["chunk_id"],
             "s_num": out_num, "s_den": out_den}
        )

    return fn


CARRY_SCHEMA = "user_id long, chunk_id long, s_num double, s_den double"


def ewma_values(events: DataFrame, alpha: float = 0.3,
                chunk_size: int = 4096) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per user
    (adjust=True closed form: Σ(1-α)^j·x_{t-j} / Σ(1-α)^j).

    The recursion num' = x + d·num, den' = 1 + d·den (d = 1-α) is a linear
    recurrence, so it parallel-prefix-decomposes instead of running one
    pandas loop over a key's whole history:

    1. rows get a per-user position (``row_number`` — WindowExec sorts with
       disk spill, never an Arrow batch) and a chunk id / in-chunk position;
    2. chunk-LOCAL prefixes run in pure Catalyst as a scaled cumulative sum
       (num_p = d^p · Σ x_q·d^{-q} over the chunk frame) — the chunk bound
       keeps d^{±p} far inside double range (auto-shrunk for extreme α, see
       below), and the local denominator is the closed-form geometric sum;
    3. per-chunk end states reduce to ONE summary row each; a hash-bucketed
       ``applyInPandas`` scan over summaries (many users per pandas batch,
       state reset at user boundaries) produces each chunk's carry-in —
       per-user rows = n_chunks, bounded for any history length, and the
       bucket grouping amortizes the ~3 ms-per-group Arrow tax that made
       one-user groups dominate the query at 15k users (round 10);
    4. carries join back co-keyed on (user_id, chunk_id) and the final
       value is (num_local + d^{p+1}·carry_num)/(den_local + d^{p+1}·carry_den),
       rounded to 5dp so engine summation orders can't flip the hash (the
       DuckDB oracle computes the same closed form with a list lambda —
       a third association — and agrees at 5dp).

    Per-task memory is O(chunk_size + n_chunks) for any key — the
    whole-history-in-one-Arrow-batch form this replaces was a hot-key OOM
    at 100 TB (SCALING.md §grouped).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    d = 1.0 - alpha
    if d == 0.0:
        # alpha == 1: no memory — EWMA is the value itself.
        return events.select(
            "event_id", F.round(F.col("value").cast("double"), 5).alias("ewma")
        )
    # d^{±(chunk-1)} must stay within ~1e±250: cap the chunk so the scaled
    # cumsum cannot overflow even for aggressive decay rates.
    safe = int(250.0 / abs(math.log10(d))) if d < 1.0 else chunk_size
    chunk = max(16, min(chunk_size, safe))

    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = events.select("user_id", "ts", "event_id", "value").withColumn(
        "gpos", F.row_number().over(w_rn) - F.lit(1)
    ).select(
        "user_id", "event_id",
        (F.col("gpos") / chunk).cast("long").alias("chunk_id"),
        (F.col("gpos") % chunk).alias("pos"),
        F.col("value").cast("double").alias("value"),
    )
    w_chunk = (
        Window.partitionBy("user_id", "chunk_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scaled = F.col("value") * F.pow(F.lit(d), -F.col("pos"))
    lnum = F.pow(F.lit(d), F.col("pos")) * F.sum(scaled).over(w_chunk)
    lden = (
        (F.lit(1.0) - F.pow(F.lit(d), F.col("pos") + 1)) / F.lit(1.0 - d)
        if d < 1.0
        else (F.col("pos") + F.lit(1)).cast("double")
    )
    local = rows.select(
        "user_id", "event_id", "chunk_id", "pos",
        lnum.alias("lnum"), lden.alias("lden"),
    ).transform(materialize)  # reused by summaries AND the final join

    summaries = local.groupBy("user_id", "chunk_id").agg(
        F.max_by("lnum", "pos").alias("num_end"),
        F.max_by("lden", "pos").alias("den_end"),
        (F.max("pos") + 1).alias("chunk_len"),
    )
    carries = _bucketed(summaries).groupBy("_b").applyInPandas(
        _ewma_carry_scan(d), schema=CARRY_SCHEMA
    )
    dk1 = F.pow(F.lit(d), F.col("pos") + 1)
    return (
        local.join(carries, on=["user_id", "chunk_id"])
        .select(
            "event_id",
            F.round(
                (F.col("lnum") + dk1 * F.col("s_num"))
                / (F.col("lden") + dk1 * F.col("s_den")),
                5,
            ).alias("ewma"),
        )
    )


def holt_level_trend(events: DataFrame, alpha: float = 0.5,
                     beta: float = 0.3) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (Holt 1957, public
    method) per user → ONE row (user_id, n, level, trend, forecast) with
    the one-step-ahead forecast level+trend. State init: level = first
    value, trend = 0.

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t − l_{t-1}) + (1-β)·b_{t-1}

    The fold runs per user inside ``applyInPandas`` (sequential state, like
    EWMA); output is O(1) per key. The 1-α/1-β complements are computed
    ONCE here and injected into the SQL oracle via ``repr``, and the
    oracle's ``list_reduce`` replays the identical expression tree — the
    doubles match bit-for-bit (fuzz-verified), with a 5dp display rounding
    on top. Scale note: the group scan holds one key's history in one
    Arrow batch — for hot keys this 2-state linear recurrence
    chunk-decomposes exactly like :func:`ewma_values` (matrix-product
    prefixes); the fixture streams are bounded so the direct fold is the
    clearer reference implementation."""
    import pandas as pd

    a, oma = alpha, 1.0 - alpha
    g, omg = beta, 1.0 - beta

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        xs = pdf["value"].tolist()
        lv, b = float(xs[0]), 0.0
        for x in xs[1:]:
            x = float(x)
            l2 = a * x + oma * (lv + b)
            b = g * (l2 - lv) + omg * b
            lv = l2
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(xs)], "level": [lv], "trend": [b],
        })

    raw = (events.select("user_id", "ts", "event_id", "value")
           .groupBy("user_id")
           .applyInPandas(fold,
                          "user_id bigint, n bigint, level double, "
                          "trend double"))
    return raw.select(
        "user_id", "n",
        F.round("level", 5).alias("level"),
        F.round("trend", 5).alias("trend"),
        F.round(F.col("level") + F.col("trend"), 5).alias("forecast"),
    )
