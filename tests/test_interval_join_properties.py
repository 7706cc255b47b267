"""Property-based tests: stream-stream interval-join drain semantics vs a
batch model (VERDICT r13 #3).

The outer-eviction boundaries were pinned at single hand-picked points
(tests/test_streaming.py:526,566); these properties replay the SAME
drain (watermark 0s, Trigger.AvailableNow) over randomized two-sided
inputs and check the full output multiset against the pure model:

* inner matches: every (l, r) same-key pair with
  ``r.ts ∈ [l.ts − band, l.ts]`` emits exactly once;
* left eviction (left/full outer): an unmatched left row emits
  null-joined iff its event time is STRICTLY below the final global
  watermark ``min(max left ts, max right ts)`` — at/above it is held in
  state and never emitted on drain;
* right eviction (full outer): an unmatched right row emits iff its last
  possible match time ``r.ts + band`` is strictly below that watermark
  (the asymmetric boundary — right rows wait a band longer);
* an empty side leaves the global watermark at epoch → no evictions.

Randomized duplicates also prove the join is multiset-correct (each
duplicate buffered row pairs independently), which the pinned points
could not.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_BASE = dt.datetime(2024, 1, 1, 12, 0, 0)
_BAND_MIN = 10

# (side, key, minute): minutes 0..25 around a 10-minute band make inner
# matches, boundary hits (r.ts == l.ts and r.ts == l.ts - band), and
# watermark-boundary holds all common
_rows = st.lists(
    st.tuples(st.sampled_from("pc"), st.integers(1, 2), st.integers(0, 25)),
    min_size=1, max_size=8,
)


def _drain(spark, rows, how):
    from pyspark.sql import Row

    from hierarchical_graph_db_spark.streaming.ingest import (
        drain_to_dataframe,
    )
    from hierarchical_graph_db_spark.streaming.streams import interval_join

    data = [
        Row(user_id=k, ts=_BASE + dt.timedelta(minutes=m), value=float(i),
            side=s)
        for i, (s, k, m) in enumerate(rows)
    ]
    d = tempfile.mkdtemp(prefix="hgdb_ijprop_")
    try:
        spark.createDataFrame(data).write.mode("overwrite").parquet(d)
        s = spark.readStream.schema(
            "user_id long, ts timestamp, value double, side string"
        ).parquet(d)
        out = drain_to_dataframe(
            interval_join(
                s.where("side = 'p'").select("user_id", "ts", "value"),
                s.where("side = 'c'").select("user_id", "ts", "value"),
                on="user_id", band=f"{_BAND_MIN} minutes",
                left_cols=["value"], right_cols=["value"],
                watermark="0 seconds", how=how),
            output_mode="append",
        )
        return Counter(
            (r["user_id"], r["ts"], r["value"], r["ts_r"], r["value_r"])
            for r in out.collect()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _model(rows, how):
    band = dt.timedelta(minutes=_BAND_MIN)
    lefts = [(k, _BASE + dt.timedelta(minutes=m), float(i))
             for i, (s, k, m) in enumerate(rows) if s == "p"]
    rights = [(k, _BASE + dt.timedelta(minutes=m), float(i))
              for i, (s, k, m) in enumerate(rows) if s == "c"]
    want = Counter()
    lmatched, rmatched = set(), set()
    for li, (lk, lts, lv) in enumerate(lefts):
        for ri, (rk, rts, rv) in enumerate(rights):
            if lk == rk and lts - band <= rts <= lts:
                want[(lk, lts, lv, rts, rv)] += 1
                lmatched.add(li)
                rmatched.add(ri)
    if lefts and rights:  # an empty side pins the global watermark at epoch
        wm = min(max(ts for _k, ts, _v in lefts),
                 max(ts for _k, ts, _v in rights))
        if how in ("left_outer", "full_outer"):
            for li, (lk, lts, lv) in enumerate(lefts):
                if li not in lmatched and lts < wm:
                    want[(lk, lts, lv, None, None)] += 1
        if how == "full_outer":
            for ri, (rk, rts, rv) in enumerate(rights):
                if ri not in rmatched and rts + band < wm:
                    want[(rk, None, None, rts, rv)] += 1
    return want


@settings(max_examples=5, deadline=None, derandomize=True)
@given(rows=_rows)
def test_left_outer_interval_join_matches_model(spark, rows):
    assert _drain(spark, rows, "left_outer") == _model(rows, "left_outer")


@settings(max_examples=5, deadline=None, derandomize=True)
@given(rows=_rows)
def test_full_outer_interval_join_matches_model(spark, rows):
    assert _drain(spark, rows, "full_outer") == _model(rows, "full_outer")
