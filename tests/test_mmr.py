"""MMR diversified top-k: reduction to plain top-k at λ=1, the
redundancy-skip property, and a differential check against a driver-side
reference greedy."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.similarity import mmr_topk


def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows])


def test_mmr_lambda_one_is_relevance_topk(spark):
    """lam_num == lam_den removes the diversity term entirely — the output
    must be the plain relevance ranking."""
    rng = random.Random(3)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = _emb(spark, corpus)
    out = mmr_topk(emb.where("vec_id < 2"), emb, k=5, pool=10,
                   lam_num=10, lam_den=10, dim=8).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rnk"])
        rels = [r["relevance"] for r in rows]
        assert rels == sorted(rels, reverse=True)
        assert [r["rnk"] for r in rows] == [1, 2, 3, 4, 5]


def test_mmr_skips_near_duplicate(spark):
    """Candidate 11 is a near-clone of candidate 10 (the top hit); at λ=0.5
    the clone's MMR score goes negative (max-sim ≈ 1 ≥ its relevance) so
    rank 2 must go to the genuinely-different candidate 12 even though the
    clone has higher relevance (hand-check: clone 0.5·0.97736 − 0.5·0.99989
    < 0 < 0.5·0.70353 − 0.5·0.54867)."""
    q = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, q),                        # the query itself
        (10, [0.98, 0.20, 0.0, 0.0]),  # top hit
        (11, [0.97, 0.21, 0.0, 0.0]),  # near-clone of 10, rel #2
        (12, [0.70, -0.7, 0.1, 0.0]),  # diverse, rel #3
        (13, [0.10, 0.0, 0.99, 0.0]),  # diverse, low rel
    ]
    emb = _emb(spark, rows)
    out = sorted(mmr_topk(emb.where("vec_id = 0"), emb, k=3, pool=4,
                          lam_num=5, lam_den=10, dim=4).collect(),
                 key=lambda r: r["rnk"])
    assert [r["neighbor_id"] for r in out[:2]] == [10, 12]


def _reference_mmr(corpus, qids, k, pool, lam_num, lam_den):
    """Float-free reference greedy (5dp-rounded cosines → ×1e5 ints)."""
    def cos5(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return round(round(dot / (math.sqrt(na) * math.sqrt(nb)), 5) * 1e5)

    vecs = dict(corpus)
    picked = {}
    for qid in qids:
        rel = sorted(((cos5(vecs[qid], v), -i) for i, v in corpus
                      if i != qid), reverse=True)[:pool]
        cand = {-ni: r5 for r5, ni in rel}
        sel: list = []
        order = []
        for _ in range(min(k, len(cand))):
            best = None
            for nid, r5 in cand.items():
                ms = max((cos5(vecs[nid], vecs[s]) for s in sel), default=0)
                score = lam_num * r5 - (lam_den - lam_num) * ms
                key = (-score, nid)
                if best is None or key < best:
                    best = key
            nid = best[1]
            sel.append(nid)
            order.append(nid)
            del cand[nid]
        picked[qid] = order
    return picked


def test_mmr_query_cap_raises(spark):
    """Bounded-pull CONTRACT (VERDICT r11 #3): an oversized query side must
    fail loudly before any work, not become an unbounded driver collect."""
    import pytest

    rng = random.Random(5)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(12)]
    emb = _emb(spark, corpus)
    with pytest.raises(ValueError, match="query side has > 3 rows"):
        mmr_topk(emb.where("vec_id < 5"), emb, k=2, pool=4, dim=4,
                 max_queries=3)
    # at the cap exactly: allowed
    out = mmr_topk(emb.where("vec_id < 3"), emb, k=2, pool=4, dim=4,
                   max_queries=3)
    assert out.count() == 6


def test_mmr_generic_string_ids(spark):
    """The documented generic id_col contract (ADVICE r11): non-integer
    vector ids must survive end-to-end with the corpus dtype, not fail in
    an int() cast."""
    rng = random.Random(9)
    emb = spark.createDataFrame(
        [Row(vec_id=f"doc{i:02d}", embedding=[rng.uniform(-1, 1)
                                              for _ in range(6)])
         for i in range(20)])
    out = mmr_topk(emb.where("vec_id = 'doc00'"), emb, k=3, pool=8, dim=6)
    assert dict((f.name, f.dataType.simpleString())
                for f in out.schema.fields)["neighbor_id"] == "string"
    rows = sorted(out.collect(), key=lambda r: r["rnk"])
    assert len(rows) == 3 and all(r["query_id"] == "doc00" for r in rows)
    assert all(r["neighbor_id"].startswith("doc") for r in rows)


def test_mmr_matches_reference_greedy(spark):
    rng = random.Random(17)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(12)]) for i in range(40)]
    emb = _emb(spark, corpus)
    out = mmr_topk(emb.where("vec_id < 3"), emb, k=6, pool=15, dim=12).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rnk"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == _reference_mmr(corpus, [0, 1, 2], k=6, pool=15,
                                 lam_num=7, lam_den=10)
