"""Property-based test: the trailing-N-day distinct-id rollup vs a
pure-Python calendar model (round-14 extension of the differential
layer).

The trap pinned here is the frame type: the trailing window is a RANGE
frame over the day NUMBER, so calendar days with no data are genuinely
absent from the union — a ROWS-frame implementation would stretch the
horizon across gaps (yesterday's "previous row" might be 3 weeks old)
and overcount. Randomized sparse calendars make gaps constant. The
model unions the per-day id sets for the days in [d−N+1, d] that exist
and counts distinct — including ids seen on multiple days only once.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_DAYS = 3

# (key, day offset 0..13, id) — 14-day span with a 3-day horizon keeps
# gaps longer than the horizon common
_rows = st.lists(
    st.tuples(st.sampled_from("xy"), st.integers(0, 13), st.integers(0, 5)),
    min_size=1, max_size=16,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_rows)
def test_rolling_distinct_counts_matches_calendar_model(spark, rows):
    from hierarchical_graph_db_spark.operators.temporal import (
        rolling_distinct_counts,
    )

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, base + dt.timedelta(days=d, hours=i % 24), i * 100 + u)
         for i, (k, d, u) in enumerate(rows)],
        "k string, ts timestamp, uid bigint")
    # ids repeat across days: i*100+u would make every row distinct, so
    # map back to the small shared id space for real cross-day overlap
    df = df.withColumn("uid", df["uid"] % 6)
    got = {(r["k"], r["day"]): r[f"ids_{_DAYS}d"]
           for r in rolling_distinct_counts(
               df, key_col="k", ts_col="ts", id_col="uid",
               days=_DAYS).collect()}

    daily = defaultdict(lambda: defaultdict(set))
    for i, (k, d, u) in enumerate(rows):
        daily[k][d].add((i * 100 + u) % 6)
    want = {}
    for k, per_day in daily.items():
        for d in per_day:
            ids = set()
            for d2 in range(d - _DAYS + 1, d + 1):
                ids |= per_day.get(d2, set())
            want[(k, base + dt.timedelta(days=d))] = len(ids)
    assert got == want
