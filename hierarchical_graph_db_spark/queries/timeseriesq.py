"""Time-series join queries over ``events``: as-of and range joins.

DuckDB oracles use its native ASOF JOIN / interval predicates, so these are
true cross-engine differential tests of the operators in
``operators/asof.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.asof import asof_join, range_join
from hierarchical_graph_db_spark.queries import query


@query(
    "asof_join_last_click",
    """
    SELECT p.event_id,
           p.user_id,
           p.ts,
           round(p.value, 2)  AS purchase_value,
           c.ts               AS ts_right,
           round(c.value, 2)  AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase: the user's most recent click at-or-before it.
    Union+window implementation — one shuffle on user_id, no range scan."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, clicks, on=["user_id"], ts_col="ts",
                    right_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("purchase_value"),
        "ts_right",
        F.round("value_right", 2).alias("click_value"),
    )


@query(
    "range_join_views_before_purchase",
    """
    SELECT p.event_id,
           CAST(count(v.event_id) AS BIGINT) AS n_views_10m
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    GROUP BY p.event_id
    """,
)
def range_join_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: views by the same user in the 10 minutes before each
    purchase. Equi-key (user_id) sort-merge with an interval filter — the
    quadratic work is bounded per user, the minimum for interval semantics."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    pairs = range_join(purchases, views, on=["user_id"], ts_col="ts",
                       lower_interval="interval 10 minutes", how="left")
    return pairs.groupBy("event_id").agg(
        F.count("event_id_r").cast("long").alias("n_views_10m")
    )
