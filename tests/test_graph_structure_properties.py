"""Property-based tests: k-core peeling, local clustering, and k-truss
pruning vs pure-Python references (round-14 extension; the fixpoint
family — dag_layers, SCC — is covered by tests/test_graph_properties.py).

* ``k_core`` — peel-to-fixed-point vs an iterative set model: surviving
  vertices AND their induced degrees must match exactly; a
  stop-too-early bug (the pre-convergence-check version's failure mode)
  shows up as sub-core vertices surviving.
* ``local_clustering`` — wedge-closing triangle credit vs brute-force
  neighborhood-pair counting: triangles per vertex and the
  2T/(d(d−1)) coefficient (0 for degree < 2).
* ``ktruss_edges`` — the ROUND COUNT is the contract (the SQL oracle
  replays the same rounds), so the model replicates exactly
  ``n_rounds`` support-and-prune rounds plus the final support report —
  not the fixpoint.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

_edges = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6))
    .filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=14, unique=True,
)


def _und(edges):
    return {tuple(sorted(e)) for e in edges}


def _adj(und):
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return nbrs


@settings(max_examples=6, deadline=None, derandomize=True)
@given(edges=_edges, k=st.sampled_from([2, 3]))
def test_k_core_matches_peeling_model(spark, edges, k):
    from hierarchical_graph_db_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["degree"] for r in k_core(df, k=k).collect()}

    und = _und(edges)
    while True:
        nbrs = _adj(und)
        drop = {v for v, ns in nbrs.items() if len(ns) < k}
        if not drop:
            break
        und = {e for e in und if e[0] not in drop and e[1] not in drop}
    want = {v: len(ns) for v, ns in _adj(und).items() if len(ns) >= k}
    assert got == want


@settings(max_examples=6, deadline=None, derandomize=True)
@given(edges=_edges)
def test_local_clustering_matches_bruteforce(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import local_clustering

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: (r["degree"], r["triangles"], r["clustering"])
           for r in local_clustering(df).collect()}

    und = _und(edges)
    nbrs = _adj(und)
    want = {}
    for v, ns in nbrs.items():
        t = sum(1 for x, y in combinations(sorted(ns), 2)
                if (x, y) in und)
        d = len(ns)
        c = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        want[v] = (d, t, c)
    assert got == want


@settings(max_examples=6, deadline=None, derandomize=True)
@given(edges=_edges, k=st.sampled_from([3, 4]))
def test_ktruss_matches_round_replicating_model(spark, edges, k):
    from hierarchical_graph_db_spark.operators.graph import ktruss_edges

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {(r["a"], r["b"]): r["support"]
           for r in ktruss_edges(df, k=k, n_rounds=3).collect()}

    def _support(und):  # per-edge common-neighbor support, current set
        nbrs = _adj(und)
        return {(a, b): len(nbrs[a] & nbrs[b]) for a, b in und}

    und = _und(edges)
    for _ in range(3):
        sup = _support(und)
        und = {e for e in und if sup[e] >= k - 2}
    want = _support(und)
    assert got == want
