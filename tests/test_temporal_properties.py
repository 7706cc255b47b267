"""Property-based tests: funnel, snapshot_diff, and LOCF resampling vs
pure-Python models (round-14 extension of the differential layer).

* ``funnel`` — strictly-ordered conversion: step i's timestamp is the
  key's FIRST step-i event at/after (>=, ties convert) the step-(i-1)
  timestamp, and a broken funnel stays broken even when later-step
  events exist out of order. Keys with no step-1 event are absent.
* ``snapshot_diff`` — null-safe change detection: NULL keys are real
  keys (eqNullSafe), NULL→value and value→NULL both count as changes,
  unchanged rows are suppressed.
* ``resample_gapfill`` — per-key dense hourly grid between first and
  last observed bucket, last-observation-carried-forward into the gaps,
  per-bucket observation = the LAST reading by event time, and the
  ``trailing`` window filter must not change fill values (the LOCF
  window runs over the full grid before the filter).
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_STEPS = ["view", "click", "purchase"]

_funnel_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 20),
              st.sampled_from(_STEPS)),
    min_size=1, max_size=14,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_funnel_rows)
def test_funnel_matches_sequential_model(spark, rows):
    from hierarchical_graph_db_spark.operators.temporal import funnel

    df = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows],
        "user_id bigint, ts bigint, event_type string")
    got = {r["user_id"]: (r["view_ts"], r["click_ts"], r["purchase_ts"],
                          r["steps_completed"])
           for r in funnel(df, _STEPS).collect()}

    per = defaultdict(list)
    for u, t, s in rows:
        per[u].append((t, s))
    want = {}
    for u, evs in per.items():
        t_prev, ts_out = None, []
        for step in _STEPS:
            if t_prev is None and ts_out:
                ts_out.append(None)  # broken funnel stays broken
                continue
            cand = [t for t, s in evs
                    if s == step and (t_prev is None or t >= t_prev)]
            t_prev = min(cand) if cand else None
            ts_out.append(t_prev)
        if ts_out[0] is not None:
            done = 1 + sum(1 for t in ts_out[1:] if t is not None)
            want[u] = (*ts_out, done)
    assert got == want


_snap_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 3)),
              st.one_of(st.none(), st.integers(0, 2))),
    min_size=0, max_size=6,
)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(old=_snap_rows, new=_snap_rows)
def test_snapshot_diff_matches_model(spark, old, new):
    from hierarchical_graph_db_spark.operators.temporal import snapshot_diff

    # one row per (possibly NULL) key
    old = {k: v for k, v in old}
    new = {k: v for k, v in new}
    o = spark.createDataFrame(list(old.items()) or [(99, 0)],
                              "k bigint, v bigint")
    n = spark.createDataFrame(list(new.items()) or [(99, 0)],
                              "k bigint, v bigint")
    if not old:
        o = o.where("k < 99")
    if not new:
        n = n.where("k < 99")
    got = {(r["k"], r["change_type"], r["old_v"], r["new_v"])
           for r in snapshot_diff(o, n, ["k"], ["v"]).collect()}

    want = set()
    for k in set(old) | set(new):
        if k not in old:
            want.add((k, "added", None, new[k]))
        elif k not in new:
            want.add((k, "removed", old[k], None))
        elif old[k] != new[k]:  # None != value counts; None == None doesn't
            want.add((k, "changed", old[k], new[k]))
    assert got == want


_gap_rows = st.lists(
    # (user, minute within a 6h span) — hourly buckets with real gaps
    st.tuples(st.integers(1, 2), st.integers(0, 360), st.integers(0, 9)),
    min_size=1, max_size=10,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_gap_rows, trailing=st.sampled_from([None, 2]))
def test_resample_gapfill_matches_locf_model(spark, rows, trailing):
    from hierarchical_graph_db_spark.operators.temporal import (
        resample_gapfill,
    )

    base = dt.datetime(2024, 1, 1)
    seen = set()
    data = []
    for u, m, v in rows:
        if (u, m) not in seen:  # operator contract: (key, ts) unique
            seen.add((u, m))
            data.append((u, base + dt.timedelta(minutes=m), float(v)))
    df = spark.createDataFrame(
        data, "user_id bigint, ts timestamp, value double")
    got = {(r["user_id"], r["bucket"]): (r["reading"], r["gap_filled"])
           for r in resample_gapfill(df, step="1 hour",
                                     trailing=trailing).collect()}

    per = defaultdict(dict)
    for u, ts, v in data:
        b = ts.replace(minute=0, second=0, microsecond=0)
        cur = per[u].get(b)
        if cur is None or ts > cur[0]:
            per[u][b] = (ts, v)  # LAST reading by event time wins
    want = {}
    for u, obs in per.items():
        lo, hi = min(obs), max(obs)
        grid, b = [], lo
        while b <= hi:
            grid.append(b)
            b += dt.timedelta(hours=1)
        last = None
        filled = []
        for b in grid:
            if b in obs:
                last = obs[b][1]
                filled.append((b, round(last, 2), False))
            else:
                filled.append((b, round(last, 2), True))
        if trailing is not None:
            filled = [f for f in filled
                      if f[0] >= hi - dt.timedelta(hours=trailing - 1)]
        for b, reading, gap in filled:
            want[(u, b)] = (reading, gap)
    assert got == want
