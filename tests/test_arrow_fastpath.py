"""Arrow fast-path parity (r6 verdict item 4): the vectorized
nearest-centroid kernel must be BIT-IDENTICAL to the default
literal-argmin expression — same cluster ids, same 6dp distances, same
trained centroids — on the real fixture and on adversarial rounding ties.
The default path stays the oracle-replayable one; ``use_arrow=True`` is
the documented cluster-scale flip (PLANS.md round-6 notes)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.arrow_kernels import (
    nearest_centroid_batch,
)
from hierarchical_graph_db_spark.operators.clustering import (
    _py_sq_dist,
    _round6,
    kmeans,
    kmeans_centroid_rows,
)
from hierarchical_graph_db_spark.operators.ivf import (
    assign_lists,
    deterministic_centroids,
    ivf_topk,
)
from tests.conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_kmeans_arrow_matches_default(spark):
    emb = _emb(spark)
    slow = sorted(tuple(r) for r in kmeans(emb, k=4, n_rounds=2).collect())
    fast = sorted(tuple(r) for r in
                  kmeans(emb, k=4, n_rounds=2, use_arrow=True).collect())
    assert slow == fast  # ids, clusters AND 6dp distances, bit-for-bit


def test_kmeans_centroid_rows_arrow_matches_default(spark):
    emb = _emb(spark)
    slow = kmeans_centroid_rows(emb, k=3, n_rounds=2, train_sample=100)
    fast = kmeans_centroid_rows(emb, k=3, n_rounds=2, train_sample=100,
                                use_arrow=True)
    assert slow == fast  # trained state identical → every round agreed


def test_ivf_arrow_matches_default(spark):
    emb = _emb(spark)
    centers = deterministic_centroids(emb, n_lists=4, n_rounds=2,
                                      train_sample=200)
    slow = sorted(tuple(r) for r in
                  assign_lists(emb, centers).collect())
    fast = sorted(tuple(r) for r in
                  assign_lists(emb, centers, use_arrow=True).collect())
    assert [(r[0], r[3]) for r in slow] == [(r[0], r[3]) for r in fast]
    q = emb.limit(5)
    s_top = sorted(tuple(r) for r in
                   ivf_topk(q, emb, centers, k=3, nprobe=2).collect())
    f_top = sorted(tuple(r) for r in
                   ivf_topk(q, emb, centers, k=3, nprobe=2,
                            use_arrow=True).collect())
    assert s_top == f_top


def test_arrow_kernel_rounding_ties(spark):
    """Adversarial: centroids whose exact distances to a point differ by
    less than 1e-6 — the rounded comparison ties and the smallest cid must
    win, exactly as the (d, cid) struct sort resolves it. Also pins the
    kernel against the driver-side fold twin on random batches."""
    rng = np.random.default_rng(7)
    V = rng.standard_normal((64, 8))
    cents = [(int(i), list(map(float, c)))
             for i, c in enumerate(rng.standard_normal((5, 8)))]
    # make centroid 3 an exact copy of centroid 1 → guaranteed rounded tie
    # on every row; smaller cid (1) must win
    cents[3] = (3, list(cents[1][1]))
    cids, dists = nearest_centroid_batch(cents, V, need_dist=True)
    assert 3 not in set(cids.tolist())
    # a near-tie within the rounding quantum: d(c0) - d(c1) < 1e-6
    base = [0.0, 0.0]
    c0 = (0, [1.0, 0.0])
    c1 = (1, [1.0000000002, 0.0])  # sq dists differ by ~4e-10
    tie_cids, tie_d = nearest_centroid_batch([c1, c0], np.array([base]),
                                             need_dist=True)
    assert tie_cids[0] == 0 and tie_d[0] == 1.0
    # exact-fold parity with the driver twin on every (row, centroid) pair
    for i in range(8):
        for cid, c in cents:
            want = _round6(_py_sq_dist(list(V[i]), c))
            got = _round6(float(
                np.cumsum((V[i] - np.asarray(c)) ** 2)[-1]))
            assert want == got


def test_arrow_plan_is_arrow_eval(spark):
    """The fast path must run as ArrowEvalPython (vectorized batches),
    never BatchEvalPython (row-at-a-time pickling)."""
    emb = _emb(spark)
    centers = deterministic_centroids(emb, n_lists=3, n_rounds=1,
                                      train_sample=100)
    plan = assign_lists(emb, centers, use_arrow=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_seed_rows_arrow_matches_default(spark):
    from hierarchical_graph_db_spark.operators.clustering import (
        _project, _seed_rows,
    )

    pts = _project(_emb(spark), "vec_id", "embedding")
    slow = _seed_rows(pts, 4, 8, use_arrow=False)
    fast = _seed_rows(pts, 4, 8, use_arrow=True)
    assert slow == fast  # pass-B min-dists bit-identical → same candidates


def test_sharded_assign_arrow_matches_default(spark):
    from hierarchical_graph_db_spark.operators.clustering import (
        semantic_dedup_sharded,
    )

    emb = _emb(spark)
    slow = sorted(tuple(r) for r in
                  semantic_dedup_sharded(emb, use_arrow=False).collect())
    fast = sorted(tuple(r) for r in
                  semantic_dedup_sharded(emb, use_arrow=True).collect())
    assert slow == fast  # per-shard argmin + 6dp dists, bit-for-bit


def test_pq_codebooks_arrow_matches_default(spark):
    from hierarchical_graph_db_spark.operators.pq import pq_codebooks

    emb = _emb(spark)
    slow = pq_codebooks(emb, dim=64, use_arrow=False)
    fast = pq_codebooks(emb, dim=64, use_arrow=True)
    assert slow == fast  # every subspace codebook identical


def test_pool_min_dist_matches_expression(spark):
    """Randomized: the Arrow pool-min-dist kernel vs the pure expression on
    adversarially close vectors (rounding-boundary shapes included)."""
    import random

    from pyspark.sql import functions as F

    from hierarchical_graph_db_spark.operators.arrow_kernels import (
        pool_min_dist_udf,
    )
    from hierarchical_graph_db_spark.operators.clustering import _sq_dist

    rng = random.Random(7)
    dim = 8
    pool = [[round(rng.uniform(-1, 1), 3) for _ in range(dim)]
            for _ in range(6)]
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
            for i in range(64)]
    # include exact pool members (distance 0) and near-ties
    rows += [(100 + j, list(c)) for j, c in enumerate(pool)]
    df = spark.createDataFrame(rows, "pid: bigint, v: array<double>")
    expr = F.array_min(F.transform(
        F.lit(pool), lambda c: F.round(_sq_dist(F.col("v"), c), 6)))
    slow = {r["pid"]: r["m"] for r in df.select("pid", expr.alias("m")).collect()}
    fast = {r["pid"]: r["m"] for r in df.select(
        "pid", pool_min_dist_udf(pool)(F.col("v")).alias("m")).collect()}
    assert slow == fast
