"""Unit tests for sessionization and similarity search."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from hierarchical_graph_db_spark.operators.similarity import (
    brute_force_topk,
    near_duplicate_pairs,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


EVENTS = [
    Row(event_id=1, user_id=1, ts=_ts(0), value=1.0),
    Row(event_id=2, user_id=1, ts=_ts(10), value=2.0),
    Row(event_id=3, user_id=1, ts=_ts(50), value=3.0),   # 40min gap → new session
    Row(event_id=4, user_id=2, ts=_ts(5), value=4.0),
]


def test_sessionize_gap_split(spark):
    out = {r["event_id"]: r["session_id"]
           for r in sessionize(spark.createDataFrame(EVENTS), 30).collect()}
    assert out[1] == out[2] == "1-1"
    assert out[3] == "1-2"
    assert out[4] == "2-1"


def test_sessionize_boundary_matches_session_window(spark):
    """An event at EXACTLY last_ts + gap is MERGED (session_window coalesces
    windows touching at an endpoint — verified against Spark batch and
    streaming); one tick later starts a new session. The batch gaps-and-
    islands form must agree, since the two are each other's oracle."""
    rows = [Row(event_id=1, user_id=1, ts=_ts(0), value=1.0),
            Row(event_id=2, user_id=1, ts=_ts(30), value=1.0)]  # exactly 30min
    out = {r["event_id"]: r["session_id"]
           for r in sessionize(spark.createDataFrame(rows), 30).collect()}
    assert out[1] == out[2] == "1-1"  # merged, matching session_window

    batch = (
        spark.createDataFrame(rows)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert batch.count() == 1  # session_window merges the same way

    late = [Row(event_id=1, user_id=1, ts=_ts(0), value=1.0),
            Row(event_id=2, user_id=1,
                ts=_ts(30) + dt.timedelta(seconds=1), value=1.0)]
    out2 = {r["event_id"]: r["session_id"]
            for r in sessionize(spark.createDataFrame(late), 30).collect()}
    assert out2[1] == "1-1" and out2[2] == "1-2"


def test_session_stats(spark):
    stats = {r["session_id"]: r
             for r in session_stats(spark.createDataFrame(EVENTS), 30).collect()}
    assert stats["1-1"]["n_events"] == 2
    assert stats["1-1"]["span_seconds"] == 600
    assert stats["1-1"]["total_value"] == 3.0
    assert stats["1-2"]["n_events"] == 1 and stats["1-2"]["span_seconds"] == 0


VECS = [
    Row(emb_id=1, embedding=[1.0, 0.0]),
    Row(emb_id=2, embedding=[0.9, 0.1]),
    Row(emb_id=3, embedding=[0.0, 1.0]),
    Row(emb_id=4, embedding=[-1.0, 0.0]),
]


def test_brute_force_topk(spark):
    df = spark.createDataFrame(VECS)
    out = brute_force_topk(df, df, k=2, id_col="emb_id",
                           vec_col="embedding").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    # nearest non-self neighbor of 1 is 2 (cos≈0.994)
    n1 = [nid for rank, nid in sorted(by_q[1])]
    assert n1[0] == 2
    assert all(len(v) == 2 for v in by_q.values())


def test_near_duplicate_pairs(spark):
    df = spark.createDataFrame(VECS)
    # exact oracle path and the default banded-LSH path must agree here:
    # the (1,2) pair has cos≈0.994 (~6° apart) so every hyperplane family
    # assigns both the same signs in 2-d.
    for kwargs in ({"exact": True}, {"dim": 2}):
        pairs = {(r["id_a"], r["id_b"]): r["score"]
                 for r in near_duplicate_pairs(df, threshold=0.99,
                                               id_col="emb_id",
                                               vec_col="embedding",
                                               **kwargs).collect()}
        assert (1, 2) in pairs and math.isclose(
            pairs[(1, 2)], 0.9 / math.sqrt(0.82), abs_tol=1e-5)
        assert all(a < b for a, b in pairs)          # canonical ordering
        assert (1, 4) not in pairs                   # opposite vectors


def test_near_duplicate_pairs_bucketed_plan_no_cross_join(spark):
    """The default path's scale contract: candidate generation is an
    equi-join — no CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    df = spark.createDataFrame(VECS)
    plan = near_duplicate_pairs(
        df, threshold=0.5, id_col="emb_id", vec_col="embedding", dim=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the exact form is no longer a cross join either: the triangular
    # block decomposition ships O(B·N) rows into B(B+1)/2 grouped-GEMM
    # tasks (round 7), so the all-pairs work is compute, not a join
    exact_plan = near_duplicate_pairs(
        df, threshold=0.5, id_col="emb_id", vec_col="embedding", exact=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in exact_plan
    assert "BroadcastNestedLoopJoin" not in exact_plan
    assert "FlatMapGroupsInPandas" in exact_plan


def test_near_duplicate_pairs_string_ids(spark):
    """The Arrow rescore kernel must preserve non-bigint id column types
    (schema is derived from the pair frame, not hardcoded)."""
    import math

    from pyspark.sql import Row

    v = [1.0] + [0.0] * 7
    w = [0.0, 1.0] + [0.0] * 6
    df = spark.createDataFrame([
        Row(vec_id="doc-a", embedding=v),
        Row(vec_id="doc-b", embedding=v),
        Row(vec_id="doc-c", embedding=w),
    ])
    got = {(r["id_a"], r["id_b"]): r["score"]
           for r in near_duplicate_pairs(df, threshold=0.9, dim=8,
                                         exact=True).collect()}
    assert got == {("doc-a", "doc-b"): 1.0}
    banded = {(r["id_a"], r["id_b"])
              for r in near_duplicate_pairs(df, threshold=0.9, dim=8,
                                            n_bands=4,
                                            band_planes=2).collect()}
    assert ("doc-a", "doc-b") in banded and ("doc-a", "doc-c") not in banded
