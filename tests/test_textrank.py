"""Weighted TextRank semantics on hand-built graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.graph import weighted_textrank

SCHEMA = "src string, dst string, weight bigint"


def _sym(spark, und_edges):
    rows = []
    for a, b, w in und_edges:
        rows += [(a, b, w), (b, a, w)]
    return spark.createDataFrame(rows, SCHEMA)


def test_ring_is_uniform(spark):
    # symmetric unweighted ring: every node identical by symmetry
    ring = _sym(spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
                        ("d", "a", 1)])
    scores = {r["id"]: r["score"]
              for r in weighted_textrank(ring, n_iter=6).collect()}
    assert len(set(scores.values())) == 1
    # TextRank fixed point for a regular graph is 1.0 exactly
    assert abs(next(iter(scores.values())) - 1.0) < 1e-6


def test_hub_outscores_leaves(spark):
    star = _sym(spark, [("hub", "l1", 1), ("hub", "l2", 1), ("hub", "l3", 1)])
    s = {r["id"]: r["score"]
         for r in weighted_textrank(star, n_iter=8).collect()}
    assert s["hub"] > s["l1"] == s["l2"] == s["l3"]


def test_weight_pulls_score(spark):
    # b is tied to a strongly, c weakly; path a-b-c with asymmetric weights
    g = _sym(spark, [("a", "b", 9), ("b", "c", 1)])
    s = {r["id"]: r["score"]
         for r in weighted_textrank(g, n_iter=8).collect()}
    # endpoints split b's mass by weight: a receives 9/10 of it
    assert s["a"] > s["c"]
    assert s["b"] > s["c"]


def test_deterministic_across_partitionings(spark):
    und = [("a", "b", 3), ("b", "c", 2), ("c", "d", 5), ("a", "d", 1),
           ("b", "d", 4)]
    one = _sym(spark, und).coalesce(1)
    many = _sym(spark, und).repartition(7)
    s1 = sorted((r["id"], r["score"])
                for r in weighted_textrank(one, n_iter=8).collect())
    s2 = sorted((r["id"], r["score"])
                for r in weighted_textrank(many, n_iter=8).collect())
    assert s1 == s2
