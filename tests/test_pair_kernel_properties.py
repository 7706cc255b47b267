"""Property-based differential tests for the block-pair cosine kernel.

`_make_block_pair_scorer` returns the REAL pandas body that
`_score_block_pairs` hands to ``applyInPandas``; driving it directly over
randomized vectors checks the GEMM-prefilter + left-fold-rescore contract
(exact pair set AND bit-level scores vs a naive per-pair fold) across
thousands of adversarial examples without Spark job overhead. The
Spark-level wiring (block membership, diagonal-vs-cross group shapes,
Catalyst rounding) is separately pinned by the oracle hash checks and
tests/test_sessionize_similarity.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hierarchical_graph_db_spark.operators.similarity import (
    _make_block_pair_scorer,
)

DIM = 4
_vec = st.lists(st.floats(min_value=-4, max_value=4, width=32,
                          allow_nan=False), min_size=DIM, max_size=DIM)


def _norm(v):
    return math.sqrt(sum((float(x) * float(x) for x in v), 0.0))


def _naive(ids, vecs, guard, pair_filter):
    """Per-pair left-fold cosine at the kernel's raw guard."""
    out = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if not pair_filter(i, j):
                continue
            a, b = vecs[i], vecs[j]
            dot = 0.0
            for d in range(DIM):
                dot = dot + float(np.float32(a[d])) * float(np.float32(b[d]))
            denom = _norm([np.float32(x) for x in a]) * _norm(
                [np.float32(x) for x in b])
            s = 0.0 if denom == 0 else dot / denom
            if s >= guard:
                out[(min(ids[i], ids[j]), max(ids[i], ids[j]))] = s
    return out


def _frame(ids, vecs, high):
    return pd.DataFrame({
        "id": ids,
        "vec": [np.array(v, dtype=np.float32) for v in vecs],
        "norm": [_norm([np.float32(x) for x in v]) for v in vecs],
        "high": high,
    })


@settings(max_examples=80, deadline=None)
@given(st.lists(_vec, min_size=2, max_size=20),
       st.sampled_from([0.0, 0.3, 0.6, 0.9]))
def test_diagonal_group_matches_naive_triangle(vectors, threshold):
    score = _make_block_pair_scorer(threshold, chunk_rows=5)  # force chunking
    ids = list(range(len(vectors)))
    got = score(_frame(ids, vectors, [False] * len(ids)))
    want = _naive(ids, vectors, threshold - 1e-5, lambda i, j: i < j)
    got_map = {(int(a), int(b)): s for a, b, s in
               zip(got["id_a"], got["id_b"], got["score"])}
    assert set(got_map) == set(want)
    for k, s in want.items():
        assert got_map[k] == s, (k, got_map[k], s)  # bit-identical left-fold


@settings(max_examples=80, deadline=None)
@given(st.lists(_vec, min_size=1, max_size=10),
       st.lists(_vec, min_size=1, max_size=10),
       st.sampled_from([0.0, 0.5, 0.9]))
def test_cross_group_matches_naive_product(lo_vecs, hi_vecs, threshold):
    score = _make_block_pair_scorer(threshold, chunk_rows=3)
    nlo, nhi = len(lo_vecs), len(hi_vecs)
    # ids interleaved so min/max orientation is exercised both ways
    lo_ids = [2 * i for i in range(nlo)]
    hi_ids = [2 * i + 1 for i in range(nhi)]
    pdf = pd.concat([
        _frame(lo_ids, lo_vecs, [False] * nlo),
        _frame(hi_ids, hi_vecs, [True] * nhi),
    ], ignore_index=True)
    got = score(pdf)
    all_ids = lo_ids + hi_ids
    all_vecs = lo_vecs + hi_vecs
    want = _naive(all_ids, all_vecs, threshold - 1e-5,
                  lambda i, j: i < nlo <= j)
    got_map = {(int(a), int(b)): s for a, b, s in
               zip(got["id_a"], got["id_b"], got["score"])}
    assert set(got_map) == set(want)
    for k, s in want.items():
        assert got_map[k] == s


def test_off_diagonal_group_never_pairs_within_a_side():
    """The round-7 regression this suite exists for: an off-diagonal
    group's lo side holds a whole block, and pairing inside it re-scores
    every same-block pair once per ride-along group."""
    score = _make_block_pair_scorer(0.0)
    v = [1.0, 0.0, 0.0, 0.0]
    pdf = pd.concat([
        _frame([1, 2], [v, v], [False, False]),   # same block, identical
        _frame([3], [v], [True]),
    ], ignore_index=True)
    got = score(pdf)
    pairs = sorted(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert pairs == [(1, 3), (2, 3)]  # never (1, 2) here
