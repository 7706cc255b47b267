"""Skyline operator semantics: hand-built frontiers, duplicate-point
collapse, strictness rules, bucket-prune safety vs a brute-force check."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.frontier import skyline_2d

SCHEMA = "x double, y int, id bigint"


def _sky(spark, rows, bucket_width=1.0):
    df = spark.createDataFrame(rows, SCHEMA)
    return skyline_2d(
        df, "x", "y",
        payload={"n": F.count(F.lit(1)).cast("bigint"),
                 "min_id": F.min("id")},
        bucket=F.floor(F.col("x") / bucket_width),
    ).collect()


def _brute(rows):
    pts = {}
    for x, y, _ in rows:
        pts[(x, y)] = pts.get((x, y), 0) + 1
    out = set()
    for (x, y) in pts:
        dominated = any(
            bx <= x and by >= y and (bx < x or by > y) for (bx, by) in pts)
        if not dominated:
            out.add((x, y))
    return out


def test_known_frontier(spark):
    rows = [(1.0, 1, 1), (2.0, 5, 2), (3.0, 3, 3),   # (3,3) beaten by (2,5)
            (2.5, 5, 4),                             # beaten by (2,5)
            (4.0, 9, 5), (5.0, 9, 6)]                # (5,9) beaten by (4,9)
    got = {(r["x"], r["y"]) for r in _sky(spark, rows)}
    assert got == {(1.0, 1), (2.0, 5), (4.0, 9)}


def test_duplicate_points_merge(spark):
    rows = [(1.0, 4, 10), (1.0, 4, 11), (1.0, 4, 12), (9.0, 1, 13)]
    out = _sky(spark, rows)
    assert len(out) == 1
    r = out[0]
    assert (r["x"], r["y"], r["n"], r["min_id"]) == (1.0, 4, 3, 10)


def test_equal_x_keeps_only_max_y(spark):
    rows = [(2.0, 3, 1), (2.0, 7, 2), (2.0, 5, 3)]
    out = _sky(spark, rows)
    assert [(r["x"], r["y"]) for r in out] == [(2.0, 7)]


def test_bucket_prune_never_overprunes(spark):
    # adversarial spread across bucket boundaries, several bucket widths
    rows = [(float(i % 13) + (i % 7) / 10.0, (i * 5) % 17, i)
            for i in range(120)]
    expect = _brute(rows)
    for width in (0.5, 1.0, 5.0, 100.0):
        got = {(r["x"], r["y"]) for r in _sky(spark, rows, width)}
        assert got == expect, f"width={width}"


def test_empty_input(spark):
    assert _sky(spark, []) == []
