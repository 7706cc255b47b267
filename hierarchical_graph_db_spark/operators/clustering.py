"""Distributed Lloyd's k-means over embedding columns.

Training-data pipelines cluster embeddings constantly — semantic dedup
groups, topic/domain discovery, diversity-balanced sampling. The reference
has no clustering (its analytics stop at Mongo lookups; SURVEY.md §2.11
lists similarity ops as north-star scope), so this is an engine addition in
the same family as ANN/centroid cohesion (``operators/similarity.py``).

Scale shape per Lloyd round (the only shapes that survive 100 TB):

* assignment — points stream once through a **broadcast** of the k×dim
  centroid table (k·dim doubles, kilobytes); argmin is a deterministic
  struct-min, no shuffle of the corpus;
* update — posexplode to (cluster, dim, component) and ONE hash aggregate:
  partial aggregation collapses map-side, shuffle volume is O(k × dim)
  regardless of corpus size;
* the new centroid table is ``localCheckpoint``-ed: the next round's plan
  starts from materialized k rows, not a growing lineage.

Seeding is deterministic k-means‖-style oversampling (Bahmani et al. 2012,
derandomized): TWO corpus passes draw an O(k) candidate pool — a
hash-ordered pseudo-uniform draw (covers every dense cluster), then the
points farthest from that draw (recovers small outlying clusters) — and
the classic k-center greedy then picks the k seeds from the candidate pool
only. Corpus scans are CONSTANT in k; the k−1 greedy rounds touch ≤2·L
candidate rows, never the corpus (the round-4 verdict's fix for the
farthest-point seeding that cost k−1 full corpus passes).

Determinism / oracle parity: no RNG anywhere (the "random" draw is a
sha256(pid) order — data-independent and identical cross-engine), every
distance folds left-to-right over doubles and is rounded to 6dp before
argmin/argmax, ties break on id, and centroid components are re-quantized
to 6dp each round. The centroid *mean* is computed as a fixed-point bigint
sum (components quantized to 1e-6 before summing): integer addition is
order-independent under partial aggregation, so the update is exactly
reproducible regardless of partitioning — unlike a double ``avg``, whose
partial-sum order can flip the 6dp rounding at boundaries. A SQL engine
replaying the same stages reaches bit-identical state (the SSSP/LPA
unrolled-oracle treatment applied to k-means; fixed round count like
PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a, b) -> F.Column:
    """Σ (aᵢ-bᵢ)² as a sequential left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def farthest_point_seeds(pts: DataFrame, k: int) -> DataFrame:
    """k-center greedy seeding over (pid, v): smallest id first, then k-1
    rounds of 'farthest point from its nearest seed' (6dp distances, ties
    on smallest id). Each round scans ``pts`` once — so call this on a
    SMALL frame (the oversampled candidate pool), not the corpus.
    Returns (cid, c) with 6dp-quantized components."""
    seeds = pts.orderBy("pid").limit(1).select(
        F.col("pid").alias("cid"),
        F.transform("v", lambda x: F.round(x, 6)).alias("c"),
    ).localCheckpoint(eager=True)
    for _ in range(k - 1):
        nxt = (
            pts.join(seeds.select(F.col("cid").alias("pid")),
                     on="pid", how="left_anti")
            .crossJoin(F.broadcast(seeds))
            .groupBy("pid", "v")
            .agg(F.min(F.round(_sq_dist(F.col("v"), F.col("c")), 6))
                 .alias("mind"))
            .orderBy(F.desc("mind"), F.asc("pid"))
            .limit(1)
            .select(F.col("pid").alias("cid"),
                    F.transform("v", lambda x: F.round(x, 6)).alias("c"))
        )
        seeds = seeds.unionByName(nxt).localCheckpoint(eager=True)
    return seeds


def oversampled_seeds(pts: DataFrame, k: int,
                      oversample: int = 8) -> DataFrame:
    """Deterministic k-means‖-style seeding in TWO corpus passes (constant
    in k), then k-center greedy over the candidate pool only.

    * pass A — pseudo-uniform draw: the ``oversample·k`` points with the
      smallest ``sha256(pid)`` (a data-independent shuffle order; a cluster
      holding ≥ 1/L of the corpus lands in the draw with high probability);
    * pass B — the ``oversample·k`` points farthest (6dp min-dist, ties on
      smallest pid) from the pass-A pool: recovers small, distant clusters
      a uniform draw can miss (the d²-weighting of k-means‖, derandomized
      to a top-L);
    * refine — :func:`farthest_point_seeds` over the ≤2L candidate rows
      (k−1 tiny jobs, no corpus access).

    Both passes are top-L selections (TakeOrdered — no corpus shuffle), and
    the pool is localCheckpoint-ed at ≤2L rows, never the corpus."""
    n_cand = oversample * k
    cand_a = (
        pts.orderBy(F.sha2(F.col("pid").cast("string"), 256), F.col("pid"))
        .limit(n_cand)
        .select("pid", "v")
        .localCheckpoint(eager=True)
    )
    pool_a = cand_a.select(F.col("pid").alias("cid"), F.col("v").alias("c"))
    cand_b = (
        pts.join(cand_a.select("pid"), on="pid", how="left_anti")
        .crossJoin(F.broadcast(pool_a))
        .groupBy("pid", "v")
        .agg(F.min(F.round(_sq_dist(F.col("v"), F.col("c")), 6))
             .alias("mind"))
        .orderBy(F.desc("mind"), F.asc("pid"))
        .limit(n_cand)
        .select("pid", "v")
    )
    candidates = cand_a.unionByName(cand_b).localCheckpoint(eager=True)
    return farthest_point_seeds(candidates, k)


def _project(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # No corpus checkpoint/persist: pts is a thin projection of the source
    # scan, so each of the (constant-count) passes re-reads the column-pruned
    # parquet — at 100 TB that beats materializing the whole corpus to
    # executor local disk (the round-4 eager localCheckpoint). Callers that
    # iterate many rounds over slow storage can persist(DISK_ONLY) upstream.
    return vectors.select(
        F.col(id_col).alias("pid"),
        F.transform(F.col(vec_col),
                    lambda x: x.cast("double")).alias("v"),
    )


def kmeans_centroids(vectors: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding", k: int = 8,
                     n_rounds: int = 3) -> DataFrame:
    """The trained centroid table (cid, c) after ``n_rounds`` of Lloyd
    iteration from the oversampled seeds — the coarse-quantizer form other
    operators (IVF ANN) build on. Deterministic and SQL-replayable
    (see module docstring)."""
    pts = _project(vectors, id_col, vec_col)
    centroids = oversampled_seeds(pts, k)
    for _ in range(n_rounds):
        scored = pts.crossJoin(F.broadcast(centroids)).select(
            "pid", "v",
            F.col("cid"),
            F.round(_sq_dist(F.col("v"), F.col("c")), 6).alias("d"),
        )
        assigned = scored.groupBy("pid", "v").agg(
            F.min(F.struct("d", "cid")).alias("best")
        ).select("pid", "v", F.col("best.cid").alias("cid"),
                 F.col("best.d").alias("d"))
        comp = assigned.select(
            "cid", F.posexplode("v").alias("pos", "x"))
        # Mean via fixed-point bigint sum: quantize components to 1e-6,
        # sum exactly (integer addition commutes under partial aggregation),
        # divide once — deterministic under any partitioning, where a
        # double avg's partial-sum order could flip the 6dp rounding.
        centroids = (
            comp.groupBy("cid", "pos")
            .agg(F.sum(F.round(F.col("x") * 1000000).cast("bigint"))
                 .alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .select("cid", "pos",
                    F.round((F.col("s") / F.lit(1000000.0)) / F.col("n"), 6)
                    .alias("c"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
                 .alias("pc"))
            .select("cid",
                    F.transform("pc", lambda s: s["c"]).alias("c"))
            .localCheckpoint(eager=True)
        )
    return centroids


def kmeans(vectors: DataFrame, id_col: str = "vec_id",
           vec_col: str = "embedding", k: int = 8,
           n_rounds: int = 3) -> DataFrame:
    """Cluster ``vectors`` into k groups; returns one row per input vector:
    (id_col, cluster, dist) where ``cluster`` is the seed vector's id and
    ``dist`` the final squared distance to the cluster centroid (6dp).

    Fixed ``n_rounds`` of Lloyd iteration (PageRank-style: the oracle
    replays the same rounds; convergence-to-fixed-point is not the
    contract — centroid quantization makes late rounds cheap no-ops)."""
    pts = _project(vectors, id_col, vec_col)
    centroids = kmeans_centroids(vectors, id_col, vec_col, k, n_rounds)
    # Final distances against the last centroid update, so the output is a
    # pure function of the published round count.
    final = pts.crossJoin(F.broadcast(centroids)).select(
        "pid", "cid", F.round(_sq_dist(F.col("v"), F.col("c")), 6).alias("d"))
    return (
        final.groupBy("pid").agg(F.min(F.struct("d", "cid")).alias("best"))
        .select(F.col("pid").alias(id_col),
                F.col("best.cid").alias("cluster"),
                F.col("best.d").alias("dist"))
    )
