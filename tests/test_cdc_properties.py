"""Property-based tests for the CDC changelog algebra.

The fixed differential tests (tests/test_cdc.py) and oracle replays pin
specific changelog shapes; these attack the algebra on randomized
base/changelog pairs: `apply_changelog` vs a pure-Python LWW model, and
the Gupta–Mumick identity for `agg_view_changelog_delta` — old view +
returned deltas must equal the view recomputed over the applied state,
including group MOVES (an update changing the group column) and
zero-cancel groups. Example counts are small (each example is a Spark
roundtrip) and derandomized so the suite stays deterministic.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

BASE_SCHEMA = "k bigint, grp string, m bigint"
CHG_SCHEMA = "k bigint, seq int, op string, grp string, m bigint"

_base_rows = st.dictionaries(
    st.integers(0, 5),
    st.tuples(st.sampled_from("abc"), st.integers(-50, 50)),
    max_size=6,
)

# (key, op, grp, m) — per-key seq assigned positionally afterwards so the
# (seq, op) order key is unique per key, the caller contract changelog_net
# documents (Debezium LSN ordering).
_changes = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from("IUD"),
              st.sampled_from("abc"), st.integers(-50, 50)),
    min_size=1, max_size=12,
)


def _seq_changes(raw):
    seq: Counter = Counter()
    out = []
    for k, op, grp, m in raw:
        seq[k] += 1
        out.append((k, seq[k], op, grp, m))
    return out


def _model_apply(base: dict, changes: list[tuple]) -> dict:
    """LWW model: per key the (seq, op)-max change wins; D deletes,
    I/U upsert; untouched base rows survive."""
    net: dict[int, tuple] = {}
    for k, s, op, grp, m in changes:
        if k not in net or (s, op) > (net[k][0], net[k][1]):
            net[k] = (s, op, grp, m)
    state = dict(base)
    for k, (_s, op, grp, m) in net.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (grp, m)
    return state


def _view(state: dict) -> dict:
    out: dict[str, list[int]] = {}
    for grp, m in state.values():
        acc = out.setdefault(grp, [0, 0])
        acc[0] += 1
        acc[1] += m
    return {g: tuple(v) for g, v in out.items()}


@settings(max_examples=8, deadline=None, derandomize=True)
@given(base=_base_rows, raw=_changes)
def test_apply_changelog_matches_lww_model(spark, base, raw):
    from hierarchical_graph_db_spark.operators.maintenance import (
        apply_changelog,
    )

    changes = _seq_changes(raw)
    bdf = spark.createDataFrame(
        [(k, g, m) for k, (g, m) in base.items()], BASE_SCHEMA)
    cdf = spark.createDataFrame(changes, CHG_SCHEMA)
    got = {r["k"]: (r["grp"], r["m"])
           for r in apply_changelog(bdf, cdf, ["k"]).collect()}
    assert got == _model_apply(base, changes)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(base=_base_rows, raw=_changes)
def test_agg_view_delta_gupta_mumick_identity(spark, base, raw):
    from hierarchical_graph_db_spark.operators.maintenance import (
        agg_view_changelog_delta,
    )

    changes = _seq_changes(raw)
    bdf = spark.createDataFrame(
        [(k, g, m) for k, (g, m) in base.items()], BASE_SCHEMA)
    cdf = spark.createDataFrame(changes, CHG_SCHEMA)
    deltas = {r["grp"]: (r["d_count"], r["d_sum"])
              for r in agg_view_changelog_delta(
                  bdf, cdf, ["k"], "grp", "m").collect()}
    # old view + deltas, count-0 groups dropped == view over applied state
    merged: dict[str, tuple] = dict(_view(base))
    for g, (dc, dm) in deltas.items():
        oc, om = merged.get(g, (0, 0))
        merged[g] = (oc + dc, om + dm)
    merged = {g: v for g, v in merged.items() if v[0] != 0}
    assert merged == _view(_model_apply(base, changes))
    # and the operator never emits an all-zero delta row
    assert all(dc != 0 or dm != 0 for dc, dm in deltas.values())
