"""Property-based tests: multi-source BFS and harmonic centrality vs
pure-Python references (round-14 extension of the differential layer).

* ``multi_source_distances`` — the level-synchronous frontier must
  produce exactly the per-source BFS distance map, capped at
  ``max_hops``: vertices beyond the cap (or unreachable) are simply
  absent, seeds carry distance 0, and the directed flag flips edge
  interpretation. A short cap over random graphs makes the
  frontier-truncation boundary constant.
* ``harmonic_centrality`` — Σ 1/d over the seeds that reach a vertex,
  with the engine's 1e-6 fixed-point per-term rounding replicated in
  the model (HALF_UP per term BEFORE the sum — a float model diverges
  at the 6th decimal for d=3, 6, 7, …).
"""

from __future__ import annotations

from collections import deque
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

_edges = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6))
    .filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=14, unique=True,
)


def _bfs(adj, src, cap):
    dist = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        if dist[v] >= cap:
            continue
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def _model_dists(edges, sources, cap, directed):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    return {(src, v): d for src in sources
            for v, d in _bfs(adj, src, cap).items()}


@settings(max_examples=6, deadline=None, derandomize=True)
@given(edges=_edges, directed=st.booleans())
def test_multi_source_distances_match_bfs(spark, edges, directed):
    from hierarchical_graph_db_spark.operators.graph import (
        multi_source_distances,
    )

    df = spark.createDataFrame([(str(a), str(b)) for a, b in edges],
                               "src string, dst string")
    sources = ["0", "3"]
    got = {(r["source"], r["id"]): r["distance"]
           for r in multi_source_distances(df, sources, max_hops=3,
                                           directed=directed).collect()}
    want = _model_dists([(str(a), str(b)) for a, b in edges],
                        sources, 3, directed)
    assert got == want


@settings(max_examples=6, deadline=None, derandomize=True)
@given(edges=_edges)
def test_harmonic_centrality_matches_fixed_point_model(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import (
        harmonic_centrality,
    )

    df = spark.createDataFrame([(str(a), str(b)) for a, b in edges],
                               "src string, dst string")
    sources = ["0", "3", "5"]
    got = {r["id"]: (r["n_sources"], r["sum_dist"], r["harmonic"])
           for r in harmonic_centrality(df, sources,
                                        max_hops=4).collect()}

    dists = _model_dists([(str(a), str(b)) for a, b in edges],
                         sources, 4, directed=False)
    per = {}
    for (src, v), d in dists.items():
        if d > 0:
            per.setdefault(v, []).append(d)
    want = {}
    for v, ds in per.items():
        fp = sum(int((Decimal(1000000) / d).quantize(
            Decimal(1), rounding=ROUND_HALF_UP)) for d in ds)
        want[v] = (len(ds), sum(ds), float(round(Decimal(fp) / 1000000, 6)))
    assert got == want
