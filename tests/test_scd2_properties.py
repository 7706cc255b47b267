"""Property-based tests: SCD2 history build + point-in-time join vs a
pure-Python version-chain model (VERDICT r13 #3).

The gaps-and-islands window build (operators/temporal.py:scd2_history)
has two boundary traps the one hash-checked fixture exercises at a single
data point only:

* equal timestamps across a version boundary — the tiebreak column must
  make the within-key order total, and an attribute flip at an identical
  timestamp produces an EMPTY half-open version [t, t); the model tiles
  them identically or the valid_to chain drifts;
* the probe-side half-open containment in point_in_time_join — a probe
  AT a version's valid_to belongs to the NEXT version, a probe before
  the key's first valid_from matches nothing (left-join nulls), and the
  NULL-ended current version absorbs everything at or after its start.

Randomized event logs over 2 keys x small ts range x 2 attribute values
force both traps constantly (ties and flips are common at this density).
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_events = st.lists(
    st.tuples(st.sampled_from("uv"), st.integers(0, 8),
              st.sampled_from("AB")),
    min_size=1, max_size=12,
)
_probes = st.lists(
    st.tuples(st.sampled_from("uvw"), st.integers(-1, 10)),
    min_size=0, max_size=8,
)


def _model_history(rows):
    """Per key: sort by (ts, event_id), collapse runs of equal attr into
    versions; valid_to = next version's valid_from (half-open tiling)."""
    per = defaultdict(list)
    for eid, (k, ts, a) in enumerate(rows):
        per[k].append((ts, eid, a))
    hist = {}
    for k, evs in per.items():
        evs.sort()
        runs = []
        for ts, _eid, a in evs:
            if not runs or runs[-1][1] != a:
                runs.append([len(runs) + 1, a, ts, None, 1])
            else:
                runs[-1][4] += 1
        for i in range(len(runs) - 1):
            runs[i][3] = runs[i + 1][2]
        hist[k] = runs  # [version, attr, valid_from, valid_to, n_events]
    return hist


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_events, probes=_probes)
def test_scd2_history_and_point_in_time_join_match_model(spark, rows,
                                                         probes):
    from hierarchical_graph_db_spark.operators.temporal import (
        point_in_time_join,
        scd2_history,
    )

    events = spark.createDataFrame(
        [(k, ts, a, eid) for eid, (k, ts, a) in enumerate(rows)],
        "k string, ts bigint, attr string, event_id bigint",
    )
    history = scd2_history(events, key_col="k", attr_col="attr",
                           ts_col="ts", tiebreak_col="event_id")
    got = {
        (r["k"], r["version"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"], r["n_events"])
        for r in history.collect()
    }
    model = _model_history(rows)
    want = {
        (k, v, a, vf, vt, vt is None, n)
        for k, runs in model.items()
        for v, a, vf, vt, n in runs
    }
    assert got == want

    # point-in-time: each probe picks up exactly the version whose
    # half-open range contains its ts (empty [t, t) versions match nothing)
    probes = sorted(set(probes))
    probe_df = spark.createDataFrame(probes or [("zz", -99)],
                                     "k string, ts bigint")
    pit = point_in_time_join(probe_df, history, key_col="k", ts_col="ts")
    got_pit = {
        (r["k"], r["ts"], r["version"], r["attr"])
        for r in pit.collect()
    }
    want_pit = set()
    for k, t in (probes or [("zz", -99)]):
        hit = None
        for v, a, vf, vt, _n in model.get(k, []):
            if vf <= t and (vt is None or t < vt):
                assert hit is None  # versions tile: at most one match
                hit = (v, a)
        want_pit.add((k, t) + (hit or (None, None)))
    assert got_pit == want_pit
