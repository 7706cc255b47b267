"""Hierarchy operators (SURVEY.md §2.10 G5): fixed-depth rollups and paths.

The reference's hierarchy is the 3-level maildir walk (user/folder/file,
``ingest_enron.py:164-178``) and the declared mailbox rollups. On the star
fixtures the mirror hierarchy is region → nation → customer → orders: fixed
depth, so paths are plain joins (no recursion), and rollups are Catalyst's
native ROLLUP/CUBE/GROUPING SETS.

Scale notes: dims (region/nation) broadcast; the fact side shuffles once on
the grouping keys; ROLLUP computes all levels in a single aggregation pass
(partial aggs per level), not one job per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def denormalized_orders(region: DataFrame, nation: DataFrame, customer: DataFrame,
                        orders: DataFrame) -> DataFrame:
    """region ⟕ nation ⟕ customer ⟕ orders star join, dims broadcast."""
    return (
        orders
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )


def hierarchy_rollup(denorm: DataFrame) -> DataFrame:
    """ROLLUP(region, nation): totals at leaf, per-region, and grand level.

    The mailbox-hierarchy rollup (G5) re-expressed on the star schema. ``lvl``
    disambiguates aggregation level (0=leaf, 1=region subtotal, 3=grand).
    """
    # count(1), not count(o_orderkey): identical semantics (the key is never
    # null) but lets the scan prune the column — ReadSchema shrinks to the
    # join key + measure.
    return denorm.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("int").alias("lvl"),
    )


def hierarchy_paths(region: DataFrame, nation: DataFrame, customer: DataFrame) -> DataFrame:
    """Materialized hierarchy paths 'region/nation/customer' (fixed 3 levels,
    mirroring the maildir path base/<user>/<folder>/<file>)."""
    return (
        customer
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("c_custkey"),
            F.concat_ws("/", "r_name", "n_name", "c_name").alias("path"),
            F.col("r_name"),
            F.col("n_name"),
        )
    )
