"""Property-based test: the trailing-horizon rolling z-score vs a
pure-Python model (round-14 extension of the differential layer).

The RANGE-frame boundary semantics are the trap: the trailing window is
``[t − 72h, t]`` INCLUSIVE at both edges over microsecond event time,
and rows SHARING a timestamp are mutual peers — an event's window
includes a same-timestamp event even when the latter sorts "after" it by
any tiebreak (SQL RANGE-frame peer rows). The model computes
stddev_samp with the n−1 denominator and replicates the min-count
suppression. Windows whose trailing values are all identical
(stddev = 0 → 0/0) are excluded from value comparison — the engines'
NaN conventions differ and the fixture oracle never exercises them —
but their row PRESENCE (the QUALIFY is on count, not on finite z) is
still asserted.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_HOURS = 2
_MIN_N = 3

# minutes 0..300 around a 2h horizon; duplicate timestamps common
_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 300), st.integers(0, 6)),
    min_size=1, max_size=14,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_rows)
def test_rolling_zscore_matches_model(spark, rows):
    from hierarchical_graph_db_spark.operators.temporal import rolling_zscore

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, u, base + dt.timedelta(minutes=m), float(v))
         for i, (u, m, v) in enumerate(rows)],
        "event_id bigint, user_id bigint, ts timestamp, value double")
    got = {r["event_id"]: (r["zscore"], r["is_anomaly"])
           for r in rolling_zscore(df, hours=_HOURS,
                                   min_n=_MIN_N).collect()}

    per = defaultdict(list)
    for i, (u, m, v) in enumerate(rows):
        per[u].append((m, i, float(v)))
    horizon = _HOURS * 60
    want, degenerate = {}, set()
    for u, evs in per.items():
        for m, eid, v in evs:
            peers = [x for (m2, _e2, x) in evs if m - horizon <= m2 <= m]
            n = len(peers)
            if n < _MIN_N:
                continue
            mean = sum(peers) / n
            sd = math.sqrt(sum((x - mean) ** 2 for x in peers) / (n - 1))
            if sd == 0.0:
                degenerate.add(eid)
                continue
            z = round((v - mean) / sd, 4) + 0.0
            want[eid] = (z, abs((v - mean) / sd) > 3.0)
    assert set(got) == set(want) | degenerate
    for eid, (z, flag) in want.items():
        gz, gflag = got[eid]
        assert gz is not None and abs(gz - z) < 5e-4, (eid, gz, z)
        assert gflag == flag, eid
