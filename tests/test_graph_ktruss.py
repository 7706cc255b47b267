"""k-truss semantics on hand-built graphs: pruning, fixpoint within the
round budget, support reporting."""

from __future__ import annotations

from hierarchical_graph_db_spark.operators.graph import ktruss_edges

SCHEMA = "src string, dst string"


def _truss(spark, edges, k, n_rounds=3):
    df = spark.createDataFrame(edges, SCHEMA)
    return {(r["a"], r["b"]): r["support"]
            for r in ktruss_edges(df, k=k, n_rounds=n_rounds).collect()}


def test_clique4_is_4truss(spark):
    # K4: every edge sits in 2 triangles -> survives k=4, dies at k=5
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    out = _truss(spark, k4, k=4)
    assert set(out) == {(a, b) for a, b in k4}
    assert all(s == 2 for s in out.values())
    assert _truss(spark, k4, k=5) == {}


def test_pendant_edges_pruned(spark):
    # triangle abc + pendant edge c-d: 3-truss keeps the triangle only
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    out = _truss(spark, edges, k=3)
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(s == 1 for s in out.values())


def test_cascade_needs_multiple_rounds(spark):
    # two triangles sharing edge b-c, plus a tail triangle that only
    # becomes light AFTER its neighbor edge is pruned -> cascading rounds
    edges = [("a", "b"), ("a", "c"), ("b", "c"),   # triangle 1
             ("b", "d"), ("c", "d"),               # triangle 2 via b-c
             ("d", "e"), ("c", "e")]               # triangle 3 via c-d
    # k=4 (support >= 2): round 1 kills the outer triangle edges (support 1),
    # which drops b-c/… support below 2 -> everything dies by the fixpoint.
    assert _truss(spark, edges, k=4) == {}


def test_round_truncation_is_the_contract(spark):
    # a long pruning cascade with n_rounds=1 keeps edges a full fixpoint
    # would remove — the fixed round count is the documented semantics
    edges = [("a", "b"), ("a", "c"), ("b", "c"),
             ("b", "d"), ("c", "d"),
             ("d", "e"), ("c", "e")]
    one_round = _truss(spark, edges, k=4, n_rounds=1)
    assert one_round != {}          # cascade not yet complete
    assert _truss(spark, edges, k=4, n_rounds=3) == {}
