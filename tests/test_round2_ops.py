"""Hand-input semantics tests for the round-2 operators.

The registry oracle checks prove engine parity on the fixtures; these pin
the *definitions* on inputs small enough to verify by hand (or against the
canonical library implementation), so a refactor can't silently change
semantics while staying self-consistent with its oracle.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.graph import local_clustering
from hierarchical_graph_db_spark.operators.grouped import ewma_values
from hierarchical_graph_db_spark.operators.similarity import (
    hard_negatives,
    label_centroid_quality,
)


def test_local_clustering_triangle_with_pendant(spark):
    """Triangle a-b-c plus pendant d hanging off a: the triangle corners
    have lcc 1 except a (degree 3, one closed pair of three), d has 0."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")], "src string, dst string"
    )
    got = {r["id"]: r for r in local_clustering(edges).collect()}
    assert got["b"]["degree"] == 2 and got["b"]["clustering"] == 1.0
    assert got["c"]["degree"] == 2 and got["c"]["clustering"] == 1.0
    # a: degree 3, 1 triangle of the 3 possible neighbor pairs → 2*1/(3*2)
    assert got["a"]["degree"] == 3
    assert got["a"]["clustering"] == pytest.approx(1 / 3, abs=1e-6)
    assert got["d"]["degree"] == 1 and got["d"]["clustering"] == 0.0
    assert got["a"]["triangles"] == 1 and got["d"]["triangles"] == 0


def test_local_clustering_ignores_direction_and_duplicates(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a")],
        "src string, dst string",
    )
    got = {r["id"]: r["clustering"] for r in local_clustering(edges).collect()}
    assert got == {"a": 1.0, "b": 1.0, "c": 1.0}


def test_ewma_matches_pandas_adjust_true(spark):
    """The num/den recursion IS pandas ewm(adjust=True); check against it."""
    rows = [
        ((pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i)).to_pydatetime(),)
        for i in range(6)
    ]
    rows = [
        (i, rows[i][0], 7, float(v))
        for i, v in enumerate([5.0, 1.0, 8.0, 8.0, 2.0, 9.5])
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma_values(ev, alpha=0.3).collect()
    }
    want = (
        pd.Series([5.0, 1.0, 8.0, 8.0, 2.0, 9.5])
        .ewm(alpha=0.3, adjust=True)
        .mean()
    )
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, abs=1e-5)


def test_ewma_orders_by_ts_not_input_order(spark):
    rows = [
        (1, pd.Timestamp("2024-01-01 00:02").to_pydatetime(), 1, 10.0),
        (0, pd.Timestamp("2024-01-01 00:01").to_pydatetime(), 1, 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r["ewma"] for r in ewma_values(ev, alpha=0.5).collect()}
    assert got[0] == 0.0  # first in event time
    # second: (10 + 0.5*0) / (1 + 0.5)
    assert got[1] == pytest.approx(10 / 1.5, abs=1e-5)


def _emb(vec_id, label, vec):
    return (vec_id, label, [float(x) for x in vec])


def test_hard_negatives_excludes_own_label(spark):
    emb = spark.createDataFrame(
        [
            _emb(0, 0, [1, 0]),
            _emb(1, 0, [1, 0.01]),   # same label — must never appear
            _emb(2, 1, [1, 0.1]),
            _emb(3, 1, [0, 1]),
        ],
        "vec_id long, label long, embedding array<float>",
    )
    out = hard_negatives(emb.where("vec_id = 0"), emb, k=10, dim=2).collect()
    ids = [r["neighbor_id"] for r in out]
    assert 1 not in ids and 0 not in ids
    # hardest negative first: vec 2 is nearly parallel to the query
    assert ids[0] == 2
    assert all(r["neg_label"] == 1 for r in out)


def test_label_centroid_quality_known_geometry(spark):
    """Label 0: two orthogonal unit vectors → centroid at 45°, cos = √2/2.
    Label 1: two identical vectors → cohesion exactly 1."""
    emb = spark.createDataFrame(
        [
            _emb(0, 0, [1, 0]),
            _emb(1, 0, [0, 1]),
            _emb(2, 1, [3, 4]),
            _emb(3, 1, [3, 4]),
        ],
        "vec_id long, label long, embedding array<float>",
    )
    got = {r["label"]: r for r in label_centroid_quality(emb, dim=2).collect()}
    assert got[0]["n_vecs"] == 2
    assert got[0]["avg_cos"] == pytest.approx(math.sqrt(2) / 2, abs=1e-4)
    assert got[1]["avg_cos"] == pytest.approx(1.0, abs=1e-5)


def test_rolling_median_even_and_odd_frames(spark, sf_dir):
    """The registry query's median interpolation on a tiny deterministic
    stream: frame grows 1,2,3 rows → median follows DuckDB's continuous
    (average-the-middles) definition."""
    # direct re-derivation on a controlled frame via the same expressions
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [(0, 1, 4.0), (1, 1, 1.0), (2, 1, 7.0)],
        "event_id long, user_id long, value double",
    )
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-10, 0)
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid = F.floor((n + 1) / 2).cast("int")
    half = F.floor(n / 2).cast("int")
    med = F.when(n % 2 == 1, F.element_at(arr, mid)).otherwise(
        (F.element_at(arr, half) + F.element_at(arr, half + 1)) / 2.0
    )
    got = [r[0] for r in ev.select(med).orderBy("event_id").collect()]
    assert got == [4.0, 2.5, 4.0]


def test_chi_square_zero_for_independent_table(spark):
    """A perfectly proportional contingency table has chi2 == 0."""
    # two segments × two types, counts exactly proportional (2:1 ratio)
    ev_rows = []
    eid = 0
    for user, seg_count in ((1, 2), (2, 1)):  # user 1 → seg A twice as active
        for etype, mult in (("x", 2), ("y", 1)):
            for _ in range(seg_count * mult * 5):
                ev_rows.append((eid, user, etype))
                eid += 1
    ev = spark.createDataFrame(ev_rows, "event_id long, user_id long, event_type string")
    obs = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("user_id").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("event_type").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("total"))
    expected = F.col("row_tot") * F.col("col_tot") / F.col("total").cast("double")
    chi2 = (
        obs.join(rt, "user_id").join(ct, "event_type").join(F.broadcast(n))
        .agg(F.sum(F.pow(F.col("o") - expected, 2) / expected).alias("chi2"))
        .collect()[0]["chi2"]
    )
    assert chi2 == pytest.approx(0.0, abs=1e-9)


def test_ewma_multi_chunk_carry_matches_pandas(spark):
    """45 events/user at chunk_size=16 → 3 chunks per user: the cross-chunk
    carry scan (the hot-key scale path, never reached by the small fixtures)
    must still reproduce pandas ewm(adjust=True) exactly."""
    base = pd.Timestamp("2024-01-01")
    rows, series, eid = [], {}, 0
    for uid in (1, 2):
        vals = [float((i * 7 + uid * 13) % 23) + 0.5 * uid for i in range(45)]
        ids = list(range(eid, eid + len(vals)))
        series[uid] = (ids, vals)
        for i, v in enumerate(vals):
            rows.append(
                (ids[i], (base + pd.Timedelta(minutes=i)).to_pydatetime(),
                 uid, v))
        eid += len(vals)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    for alpha in (0.3, 0.97):
        got = {r["event_id"]: r["ewma"]
               for r in ewma_values(ev, alpha=alpha, chunk_size=16).collect()}
        for uid, (ids, vals) in series.items():
            want = pd.Series(vals).ewm(alpha=alpha, adjust=True).mean()
            for i, w in zip(ids, want):
                assert got[i] == pytest.approx(w, abs=1e-4), (alpha, uid, i)
