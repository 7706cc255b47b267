"""Property-based tests: the chunk-decomposed EWMA and the Holt fold vs
pure-Python sequential models (VERDICT r13 #3).

``ewma_values`` never runs the textbook per-row recursion — it
parallel-prefix-decomposes the linear recurrence into chunk-local
Catalyst cumsums plus a bucketed carry scan. The property here forces
``chunk_size`` DOWN (4) so even 12-row histories span multiple chunks
and the carry join, the d^{p+1} rescaling, and the user-boundary reset
in the carry scan are all on the hot path — then compares every row
against the direct adjust=True fold. ``holt_level_trend`` is compared
against an independent reimplementation of Holt's recursion with
tie-broken (ts, event_id) ordering forced by duplicate timestamps.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(-5, 5)),
    min_size=1, max_size=12,
)
_alpha = st.sampled_from([0.3, 0.5, 0.9])


def _frame(spark, rows):
    # ts = index // 2 manufactures equal-timestamp ties so the
    # (ts, event_id) tiebreak is load-bearing, not incidental
    return spark.createDataFrame(
        [(u, i // 2, i, float(v)) for i, (u, v) in enumerate(rows)],
        "user_id bigint, ts bigint, event_id bigint, value double",
    )


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_rows, alpha=_alpha)
def test_ewma_chunked_matches_direct_fold(spark, rows, alpha):
    from hierarchical_graph_db_spark.operators.grouped import ewma_values

    # chunk_size is floored at 16 inside the operator (the d^{±p} range
    # guard) — tile the sample so per-user histories exceed one chunk and
    # the carry scan + d^{p+1} rescale are genuinely on the hot path
    rows = (rows * 4)[:40]
    got = {r["event_id"]: r["ewma"]
           for r in ewma_values(_frame(spark, rows), alpha=alpha,
                                chunk_size=16).collect()}
    assert set(got) == set(range(len(rows)))

    d = 1.0 - alpha
    per = defaultdict(list)
    for i, (u, v) in enumerate(rows):
        per[u].append((i // 2, i, float(v)))
    for u, evs in per.items():
        evs.sort()
        num = den = 0.0
        for _ts, eid, x in evs:
            num = x + d * num
            den = 1.0 + d * den
            assert abs(got[eid] - num / den) < 1e-4, (u, eid, alpha)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_rows, alpha=_alpha, beta=st.sampled_from([0.2, 0.7]))
def test_holt_matches_sequential_recursion(spark, rows, alpha, beta):
    from hierarchical_graph_db_spark.operators.grouped import (
        holt_level_trend,
    )

    got = {r["user_id"]: (r["n"], r["level"], r["trend"], r["forecast"])
           for r in holt_level_trend(_frame(spark, rows), alpha=alpha,
                                     beta=beta).collect()}

    per = defaultdict(list)
    for i, (u, v) in enumerate(rows):
        per[u].append((i // 2, i, float(v)))
    assert set(got) == set(per)
    for u, evs in per.items():
        evs.sort()
        xs = [x for _ts, _eid, x in evs]
        lv, b = xs[0], 0.0
        for x in xs[1:]:
            l2 = alpha * x + (1.0 - alpha) * (lv + b)
            b = beta * (l2 - lv) + (1.0 - beta) * b
            lv = l2
        n, level, trend, forecast = got[u]
        assert n == len(xs)
        assert abs(level - lv) < 1e-4
        assert abs(trend - b) < 1e-4
        assert abs(forecast - (lv + b)) < 1e-4
