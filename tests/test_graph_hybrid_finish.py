"""Property-based differential tests for the round-14 hybrid driver
finishes (connected_components / pagerank / personalized_pagerank).

Each test runs the SAME operator twice on a randomized adversarial graph —
``small_cutoff`` at its default (driver kernel fires: every example is under
the bound) vs ``small_cutoff=0`` (the pure distributed fixpoint, the 100 TB
shape) — and requires EXACT equality, doubles included bitwise: the driver
kernels claim bit-identity with the distributed arithmetic (same IEEE ops in
the same order, same HALF_UP fixed-point quantization), not approximation.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_digraph_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9))
    .filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=24, unique=True,
)

# Multi-edges allowed (pagerank weights by row multiplicity) — the driver
# twin must preserve them through the collect.
_multi_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7))
    .filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=30,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@settings(max_examples=8, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_cc_driver_finish_matches_distributed(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    assert _rows(connected_components(df)) == _rows(
        connected_components(df, small_cutoff=0))


@settings(max_examples=6, deadline=None, derandomize=True)
@given(edges=_multi_edges)
def test_pagerank_driver_finish_bitexact(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    for grid in ("absolute", "relative"):
        fast = _rows(pagerank(df, n_iter=4, grid=grid))
        slow = _rows(pagerank(df, n_iter=4, grid=grid, small_cutoff=0))
        assert fast == slow  # doubles compared exactly — bit-identity


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_multi_edges, n_src=st.integers(1, 3))
def test_ppr_driver_finish_bitexact(spark, edges, n_src):
    from hierarchical_graph_db_spark.operators.graph import (
        personalized_pagerank,
    )

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    srcs = sorted({v for e in edges for v in e})[:n_src]
    sdf = spark.createDataFrame([(s,) for s in srcs], "id: bigint")
    fast = _rows(personalized_pagerank(df, sdf, n_iter=4))
    slow = _rows(personalized_pagerank(df, sdf, n_iter=4, small_cutoff=0))
    assert fast == slow


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_multi_edges)
def test_hits_driver_finish_bitexact(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    fast = _rows(hits(df, n_iter=3))
    slow = _rows(hits(df, n_iter=3, small_cutoff=0))
    assert fast == slow


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges, k=st.integers(2, 4))
def test_kcore_driver_finish_matches_distributed(spark, edges, k):
    from hierarchical_graph_db_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    assert _rows(k_core(df, k=k)) == _rows(k_core(df, k=k, small_cutoff=0))


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_triangle_count_driver_finish_matches_distributed(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    assert _rows(triangle_count(df)) == _rows(
        triangle_count(df, small_cutoff=0))


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges, k=st.integers(3, 5))
def test_ktruss_driver_finish_matches_distributed(spark, edges, k):
    from hierarchical_graph_db_spark.operators.graph import ktruss_edges

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    assert _rows(ktruss_edges(df, k=k, n_rounds=3)) == _rows(
        ktruss_edges(df, k=k, n_rounds=3, small_cutoff=0))


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges, directed=st.booleans())
def test_bfs_driver_finish_matches_distributed(spark, edges, directed):
    from hierarchical_graph_db_spark.operators.graph import (
        multi_source_distances, shortest_paths,
    )

    df = spark.createDataFrame([(str(a), str(b)) for a, b in edges],
                               "src string, dst string")
    srcs = ["0", "3"]
    assert _rows(multi_source_distances(df, srcs, max_hops=3,
                                        directed=directed)) == _rows(
        multi_source_distances(df, srcs, max_hops=3, directed=directed,
                               small_cutoff=0))
    assert _rows(shortest_paths(df, "0", max_hops=4,
                                directed=directed)) == _rows(
        shortest_paths(df, "0", max_hops=4, directed=directed,
                       small_cutoff=0))


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_local_clustering_driver_finish_matches_distributed(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import local_clustering

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    assert _rows(local_clustering(df)) == _rows(
        local_clustering(df, small_cutoff=0))


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_lpa_driver_finish_matches_distributed(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import (
        label_propagation_communities,
    )

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    assert _rows(label_propagation_communities(df, n_iter=3)) == _rows(
        label_propagation_communities(df, n_iter=3, small_cutoff=0))


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_textrank_driver_finish_bitexact(spark, edges):
    from pyspark.sql import functions as F

    from hierarchical_graph_db_spark.operators.graph import weighted_textrank

    # symmetrize with integer co-occurrence-style weights (the caller shape)
    sym = [(a, b, (a + b) % 3 + 1) for a, b in edges]
    sym += [(b, a, w) for a, b, w in sym]
    df = spark.createDataFrame(sorted(set(sym)),
                               "src: bigint, dst: bigint, weight: bigint")
    fast = _rows(weighted_textrank(df, n_iter=3))
    slow = _rows(weighted_textrank(df, n_iter=3, small_cutoff=0))
    assert fast == slow


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_bellman_ford_driver_finish_bitexact(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import weighted_distances

    rows = [(str(a), str(b), float((a * 7 + b) % 5 + 1) / 4.0)
            for a, b in edges]
    df = spark.createDataFrame(rows, "src string, dst string, cost double")
    fast = _rows(weighted_distances(df, "0"))
    slow = _rows(weighted_distances(df, "0", small_cutoff=0))
    assert fast == slow


@settings(max_examples=5, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_betweenness_driver_finish_bitexact(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import betweenness_sampled

    df = spark.createDataFrame([(str(a), str(b)) for a, b in edges],
                               "src string, dst string")
    srcs = ["0", "3"]
    fast = _rows(betweenness_sampled(df, srcs, max_hops=3))
    slow = _rows(betweenness_sampled(df, srcs, max_hops=3, small_cutoff=0))
    assert fast == slow
