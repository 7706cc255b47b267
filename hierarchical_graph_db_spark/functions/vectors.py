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


def dot_static(a: Column | str, b: Column | str, dim: int) -> Column:
    """Σ aᵢ·bᵢ unrolled for a known dimension — a flat arithmetic expression
    that whole-stage codegen compiles, unlike ``aggregate``/``zip_with``
    higher-order functions which interpret per element. ~10× faster in the
    quadratic kernels (pair joins) where the dot product IS the workload.

    When both operands are column NAMES (plain identifiers), the identical
    tree is generated as ONE SQL string parsed by a single ``F.expr`` — the
    per-term ``Column``-op construction costs a py4j round trip per node,
    ~0.5 s of pure driver time per call site at dim=64 (round 15, the
    hyperplane_signature treatment applied here). Column operands keep the
    op-by-op construction (callers with computed operand expressions).
    """
    if isinstance(a, str) and isinstance(b, str):
        import re

        for name in (a, b):
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
                raise ValueError(
                    f"dot_static expects a plain column identifier, "
                    f"got {name!r}")
        # left-assoc " + " chain == the Column form's `out = out + t` order
        return F.expr(" + ".join(
            f"CAST(element_at({a}, {i + 1}) AS DOUBLE) * "
            f"CAST(element_at({b}, {i + 1}) AS DOUBLE)"
            for i in range(dim)
        ))
    terms = [
        F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def cosine_from_parts(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed dot product and per-side norms.

    The pairwise kernels project each side's norm ONCE per input row (a
    linear pass) so the N² pair stage pays only one dot product per pair —
    same arithmetic as ``cosine_similarity`` (identical float result, which
    the DuckDB oracles depend on), a third of the per-pair work.
    """
    denom = norm_a * norm_b
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_col / denom)
