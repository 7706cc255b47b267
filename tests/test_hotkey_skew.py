"""Hot-key hardening (round-2 verdict item 7): one user owning ~50% of all
events — the shape that melts naive per-key operators at 100 TB. The salted
top-k, sessionization, and chunked EWMA must stay correct under it, and the
salted/chunked plan shapes must actually be present (asserted, not claimed).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.grouped import ewma_values
from hierarchical_graph_db_spark.operators.sessionize import session_stats
from hierarchical_graph_db_spark.operators.skew import salted_topk

HOT_USER = 7


def _hot_events(spark, n=200_000):
    """~50% of rows on one user; the rest spread over ~1000 cold users.
    ts is a non-monotonic shuffle of a 50k-minute span so per-user sorted
    gaps come out varied (single giant session for the hot user, sparse
    multi-session histories for cold ones)."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT_USER))
        .otherwise((F.col("id") % 997) + 100).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + ((F.col("id") * 7) % 50_000) * 60
        ).alias("ts"),
        ((F.col("id") % 1000) / 10.0).alias("value"),
    )


def test_salted_topk_matches_direct_window_under_hot_key(spark):
    ev = _hot_events(spark)
    out = salted_topk(
        ev.select("user_id", "event_id", "value"),
        keys=["user_id"],
        order_by=[F.col("value").desc(), F.col("event_id").asc()],
        k=3,
    )
    # the salt column must survive into the optimized plan: stage 1 really
    # partitions on (user_id, _salt), so no reducer sorts the hot user whole
    assert "_salt" in out._jdf.queryExecution().optimizedPlan().toString()

    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc())
    direct = (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("user_id", "event_id", "rank")
    )
    got = {(r["user_id"], r["event_id"], r["rank"]) for r in out.collect()}
    want = {(r["user_id"], r["event_id"], r["rank"]) for r in direct.collect()}
    assert got == want and len(want) > 1000


def test_session_stats_correct_under_hot_key(spark):
    ev = _hot_events(spark)
    got = {
        (r["user_id"], r["session_id"]):
            (r["n_events"], r["span_seconds"], r["total_value"])
        for r in session_stats(ev, gap_minutes=30).collect()
    }

    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    pdf["gap"] = pdf.groupby("user_id")["ts"].diff().dt.total_seconds()
    pdf["new"] = ((pdf["gap"].isna()) | (pdf["gap"] > 30 * 60)).astype(int)
    pdf["seq"] = pdf.groupby("user_id")["new"].cumsum()
    want = {}
    for (uid, seq), g in pdf.groupby(["user_id", "seq"]):
        span = int((g["ts"].max() - g["ts"].min()).total_seconds())
        want[(uid, f"{uid}-{seq}")] = (len(g), span, round(g["value"].sum(), 2))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0] and got[k][1] == want[k][1], k
        assert got[k][2] == pytest.approx(want[k][2], abs=0.02), k
    # the hot user really is one giant session (the skewed shape under test)
    hot = [k for k in want if k[0] == HOT_USER]
    assert len(hot) == 1 and want[hot[0]][0] == 100_000


def test_ewma_hot_key_multi_chunk_matches_pandas(spark):
    """50k-event hot user at chunk_size=64 → ~780 chunk summaries flow
    through the carry scan; per-task state never holds the full history
    (the pre-rework operator shipped all 50k rows as ONE Arrow group)."""
    n = 50_000
    ev = spark.range(n).select(
        F.lit(HOT_USER).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 60).alias("ts"),
        ((F.col("id") % 321) / 7.0).alias("value"),
    )
    got = (
        ewma_values(ev, alpha=0.3, chunk_size=64)
        .orderBy("event_id").toPandas()
    )
    want = (
        pd.Series([(i % 321) / 7.0 for i in range(n)])
        .ewm(alpha=0.3, adjust=True).mean()
    )
    assert len(got) == n
    diffs = (got["ewma"].to_numpy() - want.to_numpy())
    assert abs(diffs).max() < 1e-3


def test_bucketed_grouping_matches_per_user_grouping(spark, monkeypatch):
    """Round 10: the grouped UDFs batch MANY users per pandas group
    (pmod(hash(user_id), 256) — the per-GROUP Arrow tax at 15k single-user
    groups was ~2.8 ms each and dominated the sf1 wall). The bucket fan-out
    is a pure batching choice: forcing every user into ONE bucket must give
    byte-identical results to the production 256-bucket layout, for both
    the ewma carry scan and the trend finalizer."""
    import hierarchical_graph_db_spark.operators.grouped as g

    ev = _hot_events(spark, n=20_000)

    ewma_256 = sorted(map(tuple, ewma_values(ev, alpha=0.3,
                                             chunk_size=64).collect()))
    trend_256 = sorted(map(tuple, g.user_value_trend(ev).collect()))

    monkeypatch.setattr(g, "_UDF_BUCKETS", 1)
    ewma_1 = sorted(map(tuple, ewma_values(ev, alpha=0.3,
                                           chunk_size=64).collect()))
    trend_1 = sorted(map(tuple, g.user_value_trend(ev).collect()))

    assert ewma_256 == ewma_1
    assert trend_256 == trend_1


def test_grouped_udfs_match_explicit_per_user_reference(spark):
    """ADVICE r10: bucket-count invariance (256 vs 1) alone can miss a
    user-boundary reset bug that is invariant in the bucket count. These
    are DIRECT references computed with explicit per-user pandas groupbys
    on the raw events — no bucket machinery on the reference side at all.

    * trend: the exact centered-moment + fixed-point-cell arithmetic of
      user_value_trend replayed per user in pandas — slopes must be
      byte-identical (every op is a deterministic per-row double op or an
      order-free integer-cell sum).
    * ewma: pandas groupby(user).ewm per user vs the chunked+bucketed
      operator — cross-user state leakage would blow the 1e-9 tolerance
      by orders of magnitude (adjacent users in a bucket share batches).
    """
    import math

    import hierarchical_graph_db_spark.operators.grouped as g

    ev = _hot_events(spark, n=20_000)
    pdf = ev.toPandas()

    # ---- trend: exact replay of the quantized moment pipeline ----------
    got = {r["user_id"]: (r["n_events"], r["slope"])
           for r in g.user_value_trend(ev).collect()}
    want = {}
    for uid, grp in pdf.assign(ts_sec=pdf["ts"].astype("int64") // 10**9
                               ).groupby("user_id"):
        sx = int(grp["ts_sec"].sum())
        sy_cells = int(sum(math.floor(v * 1000000.0 + 0.5)
                           for v in grp["value"]))
        n = len(grp)
        mx, my = sx / n, (sy_cells / 1000000.0) / n
        sxy = sum(math.floor((t - mx) * (v - my) * 1000.0 + 0.5)
                  for t, v in zip(grp["ts_sec"], grp["value"]))
        sxx = sum(math.floor((t - mx) * (t - mx) + 0.5)
                  for t in grp["ts_sec"])
        slope = (None if sxx == 0
                 else math.floor((sxy / 1000.0) / sxx * 1000000.0 + 0.5)
                 / 1000000.0)
        want[uid] = (n, slope)
    assert got == want

    # ---- ewma: per-user pandas ewm over event order --------------------
    out = g.ewma_values(ev, alpha=0.3, chunk_size=64).toPandas()
    ref = (
        pdf.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=0.3, adjust=True).mean())
    )
    ref_by_event = dict(zip(
        pdf.sort_values(["user_id", "ts", "event_id"])["event_id"], ref))
    diffs = [abs(r_ewma - ref_by_event[eid])
             for eid, r_ewma in zip(out["event_id"], out["ewma"])]
    assert len(diffs) == len(pdf)
    # tolerance = the operator's 6dp output rounding + closed-form vs
    # recursion float drift (measured ~5e-6); a cross-user state leak
    # shifts early-history values by ~1e-1 — 4 orders past this bar
    assert max(diffs) < 1e-5
