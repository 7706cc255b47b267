"""2-D skyline (Pareto frontier) — minimize x, maximize y.

The classic skyline operator (Börzsönyi, Kossmann & Stocker, ICDE 2001,
public method): a point survives iff no other point has x ≤ and y ≥ with at
least one strict. The reference has nothing like it (its query surface stops
at Mongo lookups, SURVEY.md §2.3); skylines are the price/quality trade-off
query every catalog-scale dataset eventually needs ("cheapest part at every
size class").

Scale shape — the naive formulation is an all-pairs NOT EXISTS self-join
(the oracle, deliberately); the engine plan is three collapsing stages, no
self-join:

1. distinct (x, y) with payload aggregates — one map-side-collapsing hash
   aggregate (exact duplicates of a point can never dominate each other, so
   they collapse to one candidate + a count);
2. coarse prune — per-bucket max(y) (a second tiny aggregate, bounded by
   the caller's bucket granularity) is collected, prefix-maxed driver-side,
   and broadcast-joined back: a point dominated by ANY strictly-earlier
   bucket's best y dies before the final stage. After this filter only the
   frontier plus the per-bucket residue (points beaten only within their
   own bucket) survive — O(frontier + n_buckets · bucket_residue) rows;
3. per-x champion + ONE ordered pass over the tiny survivor set (a global
   window, single partition BY DESIGN — the input is bucket-pruned to
   near-frontier size; this is the same "global stage runs on a provably
   small set" contract as the sorted-neighborhood second level).

Determinism: no arithmetic on x/y (raw column values compare exactly), ties
collapse in stage 1, per-x ties cannot exist after stage 1. Identical
(x, y) points do not dominate each other — they merge into one frontier row
with their count (the standard multiset-skyline convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               payload: dict[str, F.Column],
               bucket: F.Column) -> DataFrame:
    """Pareto frontier of ``df`` minimizing ``x_col``, maximizing ``y_col``.

    ``payload`` maps output column name → aggregate over the rows sharing
    one (x, y) point (e.g. ``{"n": F.count(F.lit(1))}``). ``bucket`` is a
    monotone coarsening of x — strictly smaller bucket MUST imply strictly
    smaller x (e.g. ``floor(x)``) — with caller-bounded cardinality: its
    distinct values are collected to the driver (the prefix-max table), so
    pick a granularity with at most ~10⁵ buckets.
    """
    # materialized once: the distinct-point table feeds both the bucket
    # aggregate and the survivor filter (else the stage-1 agg runs twice)
    pts = (df.groupBy(F.col(x_col), F.col(y_col))
           .agg(*[v.alias(k) for k, v in payload.items()])
           .withColumn("_b", bucket)).transform(materialize)

    # Coarse prune: prefix max of per-bucket best y, strictly-earlier
    # buckets only. Bounded collect (n_buckets rows) -> broadcast join.
    bmax = sorted((r["_b"], r["_y"]) for r in
                  pts.groupBy("_b").agg(F.max(y_col).alias("_y")).collect())
    prev_rows, running = [], None
    for b, ymax in bmax:
        prev_rows.append((b, running))
        running = ymax if running is None else max(running, ymax)
    if not prev_rows:
        return pts.drop("_b").where(F.lit(False))
    from pyspark.sql.types import StructField, StructType
    prev = pts.sparkSession.createDataFrame(
        prev_rows,
        StructType([
            StructField("_b", pts.schema["_b"].dataType, False),
            # nullable: the first bucket has no strictly-earlier best
            StructField("_py", pts.schema[y_col].dataType, True),
        ]))
    survivors = (
        pts.join(F.broadcast(prev), "_b")
        .where(F.col("_py").isNull() | (F.col(y_col) > F.col("_py")))
        .drop("_b", "_py")
    )

    # Per-x champion: y is unique within x after stage 1, so max_by needs
    # no tie-break.
    other = [c for c in survivors.columns if c != x_col]
    perx = (
        survivors.groupBy(x_col)
        .agg(F.max_by(F.struct(*other), F.col(y_col)).alias("_s"))
        .select(x_col, *[F.col(f"_s.{c}").alias(c) for c in other])
    )

    # Final ordered pass over the pruned survivors (small by construction).
    w = Window.orderBy(x_col).rowsBetween(Window.unboundedPreceding, -1)
    return (
        perx.withColumn("_rm", F.max(y_col).over(w))
        .where(F.col("_rm").isNull() | (F.col(y_col) > F.col("_rm")))
        .drop("_rm")
    )
