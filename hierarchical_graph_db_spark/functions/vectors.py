"""Vector expressions over ``array<float>`` embedding columns.

Pure Catalyst (``zip_with`` + ``aggregate``) — the dot product runs JVM-side
inside codegen, no Python round-trip. At 100 TB the brute-force form is the
verification baseline; ``operators/similarity.py`` adds the LSH-bucketed
scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double (left-fold, deterministic order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in [-1, 1]; 0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
