"""Pivot / unpivot (wide↔long reshaping).

Pivot columns are declared explicitly (the event_type domain) — at scale an
implicit pivot means a full pre-pass to discover the domain; declaring it
keeps the plan a single conditional aggregation. Oracles use portable
conditional aggregation / UNION ALL, the ANSI-stable forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "pivot_user_event_matrix",
    """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long → wide: per-user event-type count matrix via ``pivot`` with a
    declared column domain (one aggregation pass, no domain-discovery scan)."""
    ev = Catalog(spark, sf_dir).events
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
          for t in EVENT_TYPES],
    )


@query(
    "unpivot_lineitem_measures",
    """
    WITH melted AS (
        SELECT 'quantity' AS measure, round(l_quantity, 2) AS val
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT 'extendedprice', round(l_extendedprice, 2)
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT 'discount', round(l_discount, 2)
        FROM lineitem WHERE l_linenumber = 1
    )
    SELECT measure,
           CAST(count(*) AS BIGINT) AS n_rows,
           -- 2dp fixed-point bigint sum: order-independent across engines
           round(sum(CAST(round(val * 100) AS BIGINT)) / 100.0, 2)
               AS total_val,
           round(min(val), 2) AS min_val,
           round(max(val), 2) AS max_val
    FROM melted
    GROUP BY measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long via ``unpivot`` (Spark's stack), then the per-measure
    aggregation the melt feeds — the full feature-pipeline step in one
    plan. Round 10: the query previously RETURNED the melted rows
    (3 × |orders| of them), so at sf1 its wall was dominated by shipping
    4.5M rows to the driver — a 15.6× decade ratio that said nothing about
    the engine (the melt itself is linear). The registry query is now
    consumption-shaped like ``graph_link_prediction``'s r8 top-k bound:
    the unpivot still runs over every row inside the plan, but the result
    is one stats row per measure (count / fixed-point 2dp sum / min /
    max). The sum quantizes each 2dp-rounded value to an exact bigint
    cell, so engine summation order can't flip the hash."""
    li = Catalog(spark, sf_dir).lineitem.where(F.col("l_linenumber") == 1)
    up = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    rename = {"l_quantity": "quantity", "l_extendedprice": "extendedprice",
              "l_discount": "discount"}
    mapping = F.create_map(*[F.lit(x) for kv in rename.items() for x in kv])
    melted = up.select(
        mapping[F.col("measure")].alias("measure"),
        F.round("val", 2).alias("val"),
    )
    return melted.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.round(F.col("val") * 100).cast("bigint"))
                / F.lit(100.0), 2).alias("total_val"),
        F.round(F.min("val"), 2).alias("min_val"),
        F.round(F.max("val"), 2).alias("max_val"),
    )
