"""Property-based test for the as-of join vs a pure-Python model.

The union + ordered-window implementation (one shuffle, no inequality
join) has two classic boundary traps — the tie at right.ts == left.ts
(must match: "at or before") and payload columns that are NULL on the
newest prior right row (must NOT mix rows). Randomized left/right tables
force both. Right (key, ts) pairs are unique per key — the operator's
deterministic contract (with duplicate right timestamps "latest" is
ill-defined in any engine)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_left = st.lists(
    st.tuples(st.sampled_from("pq"), st.integers(0, 20)),
    min_size=1, max_size=10,
)
# right: per-key unique ts enforced post-hoc; payload may be NULL to
# exercise the atomic-struct carry.
_right = st.lists(
    st.tuples(st.sampled_from("pq"), st.integers(0, 20),
              st.one_of(st.none(), st.integers(-9, 9))),
    min_size=0, max_size=10,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(lrows=_left, rrows=_right)
def test_asof_join_matches_model(spark, lrows, rrows):
    from hierarchical_graph_db_spark.operators.asof import asof_join

    seen = set()
    rdedup = []
    for k, ts, v in rrows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((k, ts, v))
    # unique left rows too: the assert compares row SETS
    lrows = sorted({(k, ts) for k, ts in lrows})

    left = spark.createDataFrame(lrows, "k string, ts bigint")
    right = spark.createDataFrame(rdedup or [("p", -1, None)],
                                  "k string, ts bigint, v bigint")
    if not rdedup:
        right = right.where("ts >= 0")  # genuinely empty right side

    got = {(r["k"], r["ts"], r["ts_right"], r["v_right"])
           for r in asof_join(left, right, on=["k"]).collect()}

    want = set()
    for k, lts in lrows:
        prior = [(ts, v) for (rk, ts, v) in rdedup if rk == k and ts <= lts]
        if prior:
            mts, mv = max(prior)  # unique ts per key → unambiguous
            want.add((k, lts, mts, mv))
        else:
            want.add((k, lts, None, None))
    assert got == want