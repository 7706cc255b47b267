"""Property-based differential tests for the distributed graph fixpoints.

MULTIEXEC/SCC_SCALE artifacts prove the distributed paths are
partitioning-deterministic and hash-identical across execution modes at
fixture scale; these tests attack the SEMANTICS on randomized adversarial
graphs instead — `dag_layers` vs a pure-Python Kahn longest-path DP and
`strongly_connected_components` vs a pure-Python iterative Tarjan — with
``small_cutoff=0`` so every example exercises the DISTRIBUTED relaxation /
FW-BW-MIN loop, never the driver kernel the fixtures above the cutoff
already bypass. Example counts are small (each example is a real iterative
Spark fixpoint) and derandomized so the suite stays deterministic.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# Random DAG: any edge set over vertices 0..N-1 with src < dst is acyclic.
_dag_edges = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).map(sorted)
    .filter(lambda p: p[0] != p[1]).map(tuple),
    min_size=1, max_size=24, unique=True,
)

# Random digraph: arbitrary directed edges, cycles welcome (that is the
# point of SCC) — self-loops excluded (the operator's edge contract).
_digraph_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8))
    .filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=20, unique=True,
)


def _kahn_layers(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Longest-path layering reference: layer(v) = 0 for sources, else
    1 + max over predecessors (Kahn order DP)."""
    verts = {v for e in edges for v in e}
    indeg = {v: 0 for v in verts}
    succ: dict[int, list[int]] = {}
    for s, d in edges:
        succ.setdefault(s, []).append(d)
        indeg[d] += 1
    layer = {v: 0 for v in verts}
    frontier = [v for v, k in indeg.items() if k == 0]
    while frontier:
        nxt = []
        for v in frontier:
            for w in succ.get(v, ()):
                layer[w] = max(layer[w], layer[v] + 1)
                indeg[w] -= 1
                if indeg[w] == 0:
                    nxt.append(w)
        frontier = nxt
    return layer


def _tarjan_scc_min_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; every vertex labeled with its SCC's min member —
    the operator's canonical (algorithm-independent) label."""
    verts = sorted({v for e in edges for v in e})
    succ: dict[int, list[int]] = {}
    for s, d in edges:
        succ.setdefault(s, []).append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    label: dict[int, int] = {}
    counter = 0
    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            recursed = False
            children = succ.get(v, ())
            for i in range(pi, len(children)):
                w = children[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
    return label


@settings(max_examples=8, deadline=None, derandomize=True)
@given(edges=_dag_edges)
def test_dag_layers_distributed_matches_kahn_reference(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import dag_layers

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    got = {r["id"]: r["layer"]
           for r in dag_layers(df, small_cutoff=0).collect()}
    assert got == _kahn_layers(edges)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(edges=_digraph_edges)
def test_scc_distributed_matches_tarjan_reference(spark, edges):
    from hierarchical_graph_db_spark.operators.graph import (
        strongly_connected_components,
    )

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    got = {r["id"]: r["scc"]
           for r in strongly_connected_components(
               df, small_cutoff=0).collect()}
    assert got == _tarjan_scc_min_labels(edges)
