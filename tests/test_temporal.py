"""Unit tests for temporal operators (operators/temporal.py): LOCF gap-fill,
ordered funnels, snapshot CDC diff. Crafted micro-fixtures pin the semantics;
oracle parity is covered by the registry queries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.temporal import (
    funnel,
    resample_gapfill,
    snapshot_diff,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


# ---------------------------------------------------------------------------
# Gap-fill
# ---------------------------------------------------------------------------


def test_resample_gapfill_locf(spark):
    ev = spark.createDataFrame([
        Row(user_id=1, ts=_ts(1, 10), value=10.0),
        Row(user_id=1, ts=_ts(1, 50), value=11.0),   # later obs wins hour 1
        Row(user_id=1, ts=_ts(4, 0), value=40.0),    # hours 2,3 are gaps
        Row(user_id=2, ts=_ts(7, 0), value=70.0),    # single point, no grid
    ])
    got = {(r["user_id"], r["bucket"].hour): r
           for r in resample_gapfill(ev).collect()}
    assert set(got) == {(1, 1), (1, 2), (1, 3), (1, 4), (2, 7)}
    assert got[(1, 1)]["reading"] == 11.0 and not got[(1, 1)]["gap_filled"]
    assert got[(1, 2)]["reading"] == 11.0 and got[(1, 2)]["gap_filled"]
    assert got[(1, 3)]["reading"] == 11.0 and got[(1, 3)]["gap_filled"]
    assert got[(1, 4)]["reading"] == 40.0 and not got[(1, 4)]["gap_filled"]
    assert got[(2, 7)]["reading"] == 70.0 and not got[(2, 7)]["gap_filled"]


# ---------------------------------------------------------------------------
# Funnel
# ---------------------------------------------------------------------------


def test_funnel_strict_ordering(spark):
    ev = spark.createDataFrame([
        # u1 converts fully in order
        Row(user_id=1, event_type="view", ts=_ts(1)),
        Row(user_id=1, event_type="click", ts=_ts(2)),
        Row(user_id=1, event_type="purchase", ts=_ts(3)),
        # u2: click BEFORE the first view → funnel stops at view
        Row(user_id=2, event_type="click", ts=_ts(1)),
        Row(user_id=2, event_type="view", ts=_ts(2)),
        # u3: purchase before click → steps_completed = 2
        Row(user_id=3, event_type="view", ts=_ts(1)),
        Row(user_id=3, event_type="purchase", ts=_ts(2)),
        Row(user_id=3, event_type="click", ts=_ts(3)),
        # u4 never viewed → absent from output
        Row(user_id=4, event_type="purchase", ts=_ts(1)),
    ])
    got = {r["user_id"]: r for r in
           funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["steps_completed"] == 3 and got[1]["purchase_ts"] == _ts(3)
    assert got[2]["steps_completed"] == 1 and got[2]["click_ts"] is None
    assert got[3]["steps_completed"] == 2 and got[3]["purchase_ts"] is None


def test_funnel_same_timestamp_counts(spark):
    ev = spark.createDataFrame([
        Row(user_id=1, event_type="view", ts=_ts(1)),
        Row(user_id=1, event_type="click", ts=_ts(1)),  # at-or-after: counts
    ])
    [r] = funnel(ev, ["view", "click"]).collect()
    assert r["steps_completed"] == 2


# ---------------------------------------------------------------------------
# Snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_change_types(spark):
    old = spark.createDataFrame([
        Row(k=1, v=1.0), Row(k=2, v=2.0), Row(k=3, v=3.0), Row(k=4, v=None),
    ])
    new = spark.createDataFrame(
        [Row(k=2, v=2.0), Row(k=3, v=33.0), Row(k=4, v=4.0), Row(k=5, v=5.0)],
        schema=old.schema,
    )
    got = {r["k"]: r for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert set(got) == {1, 3, 4, 5}  # k=2 unchanged → dropped
    assert got[1]["change_type"] == "removed" and got[1]["new_v"] is None
    assert got[3]["change_type"] == "changed" and got[3]["new_v"] == 33.0
    assert got[4]["change_type"] == "changed"  # NULL → value is a change
    assert got[5]["change_type"] == "added" and got[5]["old_v"] is None


def test_resample_gapfill_rejects_subunit_step(spark):
    import pytest

    ev = spark.createDataFrame([Row(user_id=1, ts=_ts(1), value=1.0)])
    with pytest.raises(ValueError, match="whole unit"):
        resample_gapfill(ev, step="30 minutes")
    with pytest.raises(ValueError, match="whole unit"):
        resample_gapfill(ev, step="hour")


def test_resample_gapfill_rejects_nonpositive_trailing(spark):
    """trailing <= 0 would build 'interval -1 <unit>' and silently return an
    empty frame; enforce instead of document, like the step check
    (ADVICE r9)."""
    import pytest

    ev = spark.createDataFrame([Row(user_id=1, ts=_ts(1), value=1.0)])
    with pytest.raises(ValueError, match="trailing"):
        resample_gapfill(ev, trailing=0).collect()
    with pytest.raises(ValueError, match="trailing"):
        resample_gapfill(ev, trailing=-2).collect()


# ---------------------------------------------------------------------------
# SCD Type 2 history build
# ---------------------------------------------------------------------------


def test_scd2_collapses_runs_into_versions(spark):
    from datetime import datetime
    from pyspark.sql import Row
    from hierarchical_graph_db_spark.operators.temporal import scd2_history

    t = lambda h: datetime(2026, 1, 1, h)
    ev = spark.createDataFrame([
        Row(user_id=1, event_type="view", ts=t(0), event_id=1),
        Row(user_id=1, event_type="view", ts=t(1), event_id=2),
        Row(user_id=1, event_type="click", ts=t(2), event_id=3),
        Row(user_id=1, event_type="view", ts=t(3), event_id=4),
        Row(user_id=2, event_type="buy", ts=t(0), event_id=5),
    ])
    rows = {(r["user_id"], r["version"]): r
            for r in scd2_history(ev).collect()}
    assert len(rows) == 4  # user 1: view,click,view; user 2: buy
    v1 = rows[(1, 1)]
    assert (v1["event_type"], v1["n_events"]) == ("view", 2)
    assert v1["valid_from"] == t(0) and v1["valid_to"] == t(2)
    assert not v1["is_current"]
    v2 = rows[(1, 2)]
    assert v2["event_type"] == "click" and v2["valid_to"] == t(3)
    v3 = rows[(1, 3)]
    # the re-appearance of "view" is a NEW version (SCD2, not a dedup)
    assert v3["event_type"] == "view" and v3["is_current"]
    assert v3["valid_to"] is None
    assert rows[(2, 1)]["is_current"]


def test_scd2_tiebreak_makes_equal_ts_deterministic(spark):
    from datetime import datetime
    from pyspark.sql import Row
    from hierarchical_graph_db_spark.operators.temporal import scd2_history

    ts = datetime(2026, 1, 1)
    ev = spark.createDataFrame([
        Row(user_id=1, event_type="b", ts=ts, event_id=2),
        Row(user_id=1, event_type="a", ts=ts, event_id=1),
    ])
    rows = sorted(scd2_history(ev).collect(), key=lambda r: r["version"])
    # event_id breaks the ts tie: "a" (id 1) precedes "b" (id 2)
    assert [r["event_type"] for r in rows] == ["a", "b"]
    assert rows[0]["valid_to"] == ts and rows[1]["is_current"]


def test_point_in_time_join_boundaries_and_unmatched(spark):
    """Half-open [valid_from, valid_to): a probe AT valid_from matches the
    new version, a probe AT valid_to matches the NEXT version, a probe
    before all history or for an unknown key null-fills (left join)."""
    import datetime as dt

    from hierarchical_graph_db_spark.operators.temporal import (
        point_in_time_join,
    )

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    hist = spark.createDataFrame(
        [(1, 1, "a", t(10), t(20)), (1, 2, "b", t(20), None)],
        "user_id: bigint, version: bigint, attr: string, "
        "valid_from: timestamp, valid_to: timestamp")
    probe = spark.createDataFrame(
        [(100, 1, t(10)), (101, 1, t(20)), (102, 1, t(5)),
         (103, 9, t(15)), (104, 1, t(99))],
        "event_id: bigint, user_id: bigint, ts: timestamp")
    rows = {r["event_id"]: (r["attr"], r["version"])
            for r in point_in_time_join(probe, hist, "user_id").collect()}
    assert rows[100] == ("a", 1)      # at valid_from → new version
    assert rows[101] == ("b", 2)      # at valid_to → next version
    assert rows[102] == (None, None)  # before history
    assert rows[103] == (None, None)  # unknown key
    assert rows[104] == ("b", 2)      # open-ended current row


def test_resample_gapfill_trailing_window(spark):
    """trailing=N keeps each key's last N buckets but LOCF still seeds from
    observations OLDER than the emitted window (the filter runs after the
    carry-forward window function, not before)."""
    ev = spark.createDataFrame([
        Row(user_id=1, ts=_ts(1, 0), value=10.0),   # outside trailing window
        Row(user_id=1, ts=_ts(6, 0), value=60.0),   # hours 2..5 are gaps
    ])
    rows = {r["bucket"].hour: r
            for r in resample_gapfill(ev, trailing=3).collect()}
    # span is hours 1..6; trailing 3 keeps hours 4,5,6 only
    assert set(rows) == {4, 5, 6}
    # hours 4,5 are gap-filled from the hour-1 observation OUTSIDE the window
    assert rows[4]["reading"] == 10.0 and rows[4]["gap_filled"]
    assert rows[5]["reading"] == 10.0 and rows[5]["gap_filled"]
    assert rows[6]["reading"] == 60.0 and not rows[6]["gap_filled"]
