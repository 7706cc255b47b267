"""Similarity search over embedding columns (SURVEY.md §2.11).

Two paths:

* ``brute_force_topk`` — exact cosine top-k via broadcast cross-join +
  per-query window. Correctness baseline; fine whenever the *query* set is
  small (it broadcasts) even if the corpus is 100 TB — the corpus side only
  scans, no shuffle except the final per-query top-k aggregation.
* ``lsh_topk`` — approximate scale path: random-hyperplane LSH buckets
  (SimHash for vectors); candidates = same-bucket pairs only, so the
  cross-join shrinks from |Q|×|C| to per-bucket blocks.

Both stay in Catalyst expressions (``zip_with``/``aggregate`` dot products) —
no Python in the row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hierarchical_graph_db_spark.functions.vectors import cosine_similarity

# Deterministic pseudo-random hyperplanes: signs derived from sha2 of
# (plane, dim) — reproducible across runs/engines without numpy state.


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query row.

    Output: (query_id, neighbor_id, score, rank). The score is rounded before
    ranking so the rank order is reproducible across platforms; ties break by
    neighbor id (deterministic total order).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q)  # query side is small by contract; corpus side streams
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), round_digits)
            .alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_signature(vec_col, n_planes: int, dim: int):
    """LSH bit-signature: sign of ⟨v, hᵖ⟩ for n deterministic hyperplanes.

    Hyperplane p's component for dimension d is +1/-1 by parity of
    ``crc32(p:d)`` — deterministic, no stored model. Returns a string column
    of '0'/'1' bits (bucket key material).
    """
    bits = []
    for p in range(n_planes):
        # ±1 pattern for this plane over the dims, as an array literal
        signs = F.array(*[
            F.lit(1.0 if (hash_sign(p, d)) else -1.0) for d in range(dim)
        ])
        proj = F.aggregate(
            F.zip_with(vec_col, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def hash_sign(plane: int, dim: int) -> bool:
    """Deterministic sign for (plane, dim) — stable across processes."""
    import zlib

    return bool(zlib.crc32(f"{plane}:{dim}".encode()) & 1)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to equal LSH bucket.

    At 100 TB: corpus is written bucketed/partitioned by ``bucket`` once;
    queries hash to buckets and the join becomes a co-located equi-join on a
    key with ~|corpus|/2^n_planes rows per bucket — no quadratic blowup.
    Recall tunes via n_planes (fewer planes → bigger buckets → higher recall).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 5).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def near_duplicate_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, score ≥ threshold).

    Brute-force form — the correctness oracle. The scale path is ``lsh_topk``
    semantics: bucket first, pair within buckets.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("vec_a"), F.col("vec_b")), 5).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
