"""As-of / range join semantics: tie handling, no-match nulls, interval edges."""

from __future__ import annotations

import datetime as dt

from hierarchical_graph_db_spark.operators.asof import asof_join, range_join


def _t(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "p1"), (1, _t(30), "p2"), (2, _t(5), "p3")],
        "user_id int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(25), 200.0), (3, _t(1), 999.0)],
        "user_id int, ts timestamp, value double")
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = {r["tag"]: r for r in
           asof_join(left, right, on=["user_id"], ts_col="ts",
                     right_cols=["value"]).collect()}
    # tie at ts=10: right row at the same instant matches ('<=')
    assert out["p1"]["value_right"] == 100.0
    assert out["p1"]["ts_right"] == _t(10)
    # latest prior, not first
    assert out["p2"]["value_right"] == 200.0
    # user 2 has no right rows at all → nulls, row preserved
    assert out["p3"]["value_right"] is None and out["p3"]["ts_right"] is None
    assert len(out) == 3


def test_asof_join_null_payload_not_mixed(spark):
    """The carried right columns must all come from the SAME right row: a
    NULL payload in the newest prior right row stays NULL — it must not be
    back-filled from an older right row (per-column fill bug)."""
    left = spark.createDataFrame([(1, _t(30), "p")],
                                 "user_id int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(20), None)],
        "user_id int, ts timestamp, value double")
    row = asof_join(left, right, on=["user_id"], ts_col="ts",
                    right_cols=["value"]).collect()[0]
    assert row["ts_right"] == _t(20)
    assert row["value_right"] is None  # not 100.0 from the older row


def test_asof_join_equal_ts_right_rows_deterministic(spark):
    """Two right rows at the same instant: the winner is deterministic
    (greatest payload struct), independent of input order."""
    left = spark.createDataFrame([(1, _t(30), "p")],
                                 "user_id int, ts timestamp, tag string")
    for rows in ([(1, _t(20), 1.0), (1, _t(20), 2.0)],
                 [(1, _t(20), 2.0), (1, _t(20), 1.0)]):
        right = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
        out = asof_join(left, right.repartition(4), on=["user_id"], ts_col="ts",
                        right_cols=["value"]).collect()[0]
        assert out["value_right"] == 2.0


def test_range_join_bounds(spark):
    left, right = _frames(spark)
    pairs = range_join(left, right, on=["user_id"], ts_col="ts",
                       lower_interval="interval 10 minutes", how="inner")
    got = {(r["tag"], r["value_r"]) for r in pairs.collect()}
    # p1@10 window [0,10] → right@10 only; p2@30 window [20,30] → right@25
    assert got == {("p1", 100.0), ("p2", 200.0)}
