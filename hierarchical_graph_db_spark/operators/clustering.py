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

Seeding is deterministic farthest-point (k-center greedy, the classic
k-means++ derandomization): seed 1 is the smallest id, each next seed the
point farthest from its nearest seed (ties → smallest id). That costs k-1
extra broadcast passes over the corpus but spreads seeds across well
separated clusters — smallest-k-ids seeding collapses whole blobs into one
cluster whenever the low ids happen to be co-located.

Determinism / oracle parity: no RNG anywhere, every distance folds
left-to-right over doubles and is rounded to 6dp before argmin/argmax,
ties break on id, and centroid components are re-quantized to 6dp each
round — so a SQL engine replaying the same stages reaches bit-identical
state (the SSSP/LPA unrolled-oracle treatment applied to k-means; fixed
round count like PageRank).
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
    on smallest id). Each round is one broadcast pass + a 1-row top-k —
    no corpus shuffle. Returns (cid, c) with 6dp-quantized components."""
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


def kmeans(vectors: DataFrame, id_col: str = "vec_id",
           vec_col: str = "embedding", k: int = 8,
           n_rounds: int = 3) -> DataFrame:
    """Cluster ``vectors`` into k groups; returns one row per input vector:
    (id_col, cluster, dist) where ``cluster`` is the seed vector's id and
    ``dist`` the final squared distance to the cluster centroid (6dp).

    Fixed ``n_rounds`` of Lloyd iteration (PageRank-style: the oracle
    replays the same rounds; convergence-to-fixed-point is not the
    contract — centroid quantization makes late rounds cheap no-ops)."""
    pts = vectors.select(
        F.col(id_col).alias("pid"),
        F.transform(F.col(vec_col),
                    lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)  # seeding + every round rescan this
    centroids = farthest_point_seeds(pts, k)

    assigned = None
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
        centroids = (
            comp.groupBy("cid", "pos").agg(F.round(F.avg("x"), 6).alias("c"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
                 .alias("pc"))
            .select("cid",
                    F.transform("pc", lambda s: s["c"]).alias("c"))
            .localCheckpoint(eager=True)
        )
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
