"""Sampled Brandes betweenness semantics on textbook graphs."""

from __future__ import annotations

from hierarchical_graph_db_spark.operators.graph import betweenness_sampled

SCHEMA = "src string, dst string"


def _bw(spark, edges, sources, max_hops=4):
    df = spark.createDataFrame(edges, SCHEMA)
    return {r["id"]: r["betweenness"]
            for r in betweenness_sampled(df, sources, max_hops).collect()}


def test_path_graph_single_source(spark):
    # a->b->c->d from source a: delta(b)=2, delta(c)=1, delta(d)=0
    bw = _bw(spark, [("a", "b"), ("b", "c"), ("c", "d")], ["a"])
    assert bw == {"b": 2.0, "c": 1.0, "d": 0.0}


def test_diamond_splits_dependency(spark):
    # a->{b,c}->d: two shortest paths to d, each middle carries 1/2
    bw = _bw(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")], ["a"])
    assert bw == {"b": 0.5, "c": 0.5, "d": 0.0}


def test_shortcut_excludes_longer_path(spark):
    # a->b->c plus direct a->c: b is NOT on the shortest a->c path
    bw = _bw(spark, [("a", "b"), ("b", "c"), ("a", "c")], ["a"])
    assert bw == {"b": 0.0, "c": 0.0}


def test_hop_bound_truncates(spark):
    # 5-chain with max_hops=2 only credits paths of <=2 edges
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    bw = _bw(spark, edges, ["a"], max_hops=2)
    assert bw == {"b": 1.0, "c": 0.0}


def test_multi_source_sums(spark):
    # path a->b->c from sources a and b: delta_a(b)=1, so bw(b)=1
    bw = _bw(spark, [("a", "b"), ("b", "c")], ["a", "b"])
    assert bw["b"] == 1.0
    assert bw["c"] == 0.0


def test_deterministic_across_partitionings(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
             ("b", "e"), ("e", "f"), ("c", "f")]
    one = _bw(spark, edges, ["a", "b"])
    df = spark.createDataFrame(edges, SCHEMA).repartition(7)
    many = {r["id"]: r["betweenness"]
            for r in betweenness_sampled(df, ["a", "b"], 4).collect()}
    assert one == many
