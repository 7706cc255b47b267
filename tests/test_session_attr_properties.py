"""Property-based tests: gap sessionization and U-shaped attribution vs
pure-Python models (round-14 extension of the differential layer).

Both operators are hash-checked against DuckDB oracles that REPLAY the
same windowed-SQL algorithm; the models here are independent sequential
folds, so they catch a shared-algorithm bug the oracle replay cannot:

* ``sessionize`` — the boundary is pinned semantics: an event at EXACTLY
  ``last_ts + gap`` merges into the session (Spark's ``session_window``
  endpoint-coalescing contract); a new session needs a STRICT ``>`` gap.
  Ties on ts are ordered by event_id.
* ``u_shaped_attribution`` — the touch band is inclusive at BOTH edges
  (a click at exactly ``p_ts − 4h`` or exactly ``p_ts`` counts); credit
  is 100% / 50-50 / 40-20-40 with the middle share split by HALF_UP
  rounding; the credited value multiplies in cent-micros.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

_GAP_MIN = 30

_sess_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 200)),  # (user, minute)
    min_size=1, max_size=14,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_sess_rows)
def test_sessionize_matches_sequential_model(spark, rows):
    from hierarchical_graph_db_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [(u, m * 60, i, 1.0) for i, (u, m) in enumerate(rows)],
        "user_id bigint, ts bigint, event_id bigint, value double",
    )
    got = {r["event_id"]: (r["user_id"], r["session_seq"], r["session_id"])
           for r in sessionize(df, gap_minutes=_GAP_MIN).collect()}
    assert len(got) == len(rows)

    per = defaultdict(list)
    for i, (u, m) in enumerate(rows):
        per[u].append((m * 60, i))
    for u, evs in per.items():
        evs.sort()
        seq, prev = 0, None
        for ts, eid in evs:
            # strict >: an event at exactly prev + gap merges
            if prev is None or ts - prev > _GAP_MIN * 60:
                seq += 1
            prev = ts
            assert got[eid] == (u, seq, f"{u}-{seq}"), (u, eid)


_attr_rows = st.lists(
    # (side p/c, user, minute in a 10h range, value) — 4h band edges and
    # multi-purchase overlap are both common at this density
    st.tuples(st.sampled_from("pc"), st.integers(1, 2),
              st.integers(0, 600), st.integers(1, 9)),
    min_size=1, max_size=12,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_attr_rows)
def test_u_shaped_attribution_matches_model(spark, rows):
    import datetime as dt

    from hierarchical_graph_db_spark.operators.temporal import (
        u_shaped_attribution,
    )

    base = dt.datetime(2024, 1, 1)
    purchases = [(i, u, base + dt.timedelta(minutes=m), float(v))
                 for i, (s, u, m, v) in enumerate(rows) if s == "p"]
    clicks = [(i, u, base + dt.timedelta(minutes=m))
              for i, (s, u, m, v) in enumerate(rows) if s == "c"]
    p = spark.createDataFrame(
        purchases or [(-1, -1, base, 0.0)],
        "purchase_id bigint, user_id bigint, p_ts timestamp, value double")
    c = spark.createDataFrame(
        clicks or [(-1, -1, base - dt.timedelta(days=9))],
        "click_id bigint, c_uid bigint, c_ts timestamp")
    if not purchases:
        p = p.where("purchase_id >= 0")
    if not clicks:
        c = c.where("click_id >= 0")

    got = {(r["purchase_id"], r["click_id"]):
           (r["pos"], r["n"], r["credit_ppm"], r["credit_value_micros"])
           for r in u_shaped_attribution(p, c, band_hours=4).collect()}

    band = dt.timedelta(hours=4)
    want = {}
    for pid, u, pts, v in purchases:
        touch = sorted((cts, cid) for cid, cu, cts in clicks
                       if cu == u and pts - band <= cts <= pts)
        n = len(touch)
        for pos0, (cts, cid) in enumerate(touch):
            pos = pos0 + 1
            if n == 1:
                ppm = 1000000
            elif n == 2:
                ppm = 500000
            elif pos in (1, n):
                ppm = 400000
            else:
                ppm = int((Decimal(200000) / (n - 2))
                          .quantize(Decimal(1), rounding=ROUND_HALF_UP))
            cents = int(Decimal(v * 100)
                        .quantize(Decimal(1), rounding=ROUND_HALF_UP))
            want[(pid, cid)] = (pos, n, ppm, cents * ppm)
    assert got == want
