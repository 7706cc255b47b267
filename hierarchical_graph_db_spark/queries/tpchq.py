"""Classic warehouse multi-join queries on the TPC-H-ish fixtures.

The reference has no relational layer at all (SURVEY.md §2.5 — joins are a
north-star addition); these are the recognizable TPC-H shapes (Q3 shipping
priority, Q5 local supplier volume) plus a blocked edit-distance join —
the standard proof that the full select/join/agg/order surface composes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer dim broadcast into the
    orders⋈lineitem fact-fact join, one aggregation, deterministic top-10
    (revenue desc, then key). Filters sit on the scans — pushdown does the
    pruning before any join."""
    cat = Catalog(spark, sf_dir)
    cutoff = F.lit("1998-06-01").cast("timestamp")
    c = cat.customer.where(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    o = cat.orders.where(F.col("o_orderdate") < cutoff) \
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = cat.lineitem.where(F.col("l_shipdate") > cutoff) \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the six-table star — region→nation→supplier dims
    broadcast, customer⋈orders⋈lineitem carry the volume, and the
    'local supplier' predicate (customer and supplier share a nation) rides
    the supplier join. One aggregation at the end; Catalyst reorders the
    broadcasts ahead of the fact-fact shuffle."""
    cat = Catalog(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    r = cat.region.where(F.col("r_name") == "ASIA").select("r_regionkey")
    n = cat.nation.join(F.broadcast(r),
                        F.col("n_regionkey") == F.col("r_regionkey")) \
        .select("n_nationkey", "n_name")
    s = cat.supplier.join(F.broadcast(n),
                          F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey", "s_nationkey", "n_name")
    o = cat.orders.where((F.col("o_orderdate") >= lo)
                         & (F.col("o_orderdate") < hi)) \
        .select("o_orderkey", "o_custkey")
    c = cat.customer.select("c_custkey", "c_nationkey")
    li = cat.lineitem.select("l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): which customers returned
    the most revenue in a half-year window (widened from the spec's quarter
    so the synthetic fixture yields enough returned lineitems) —
    returnflag-filtered lineitem into the orders join, customer + nation
    dims broadcast, deterministic top-20."""
    cat = Catalog(spark, sf_dir)
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-07-01").cast("timestamp")
    o = cat.orders.where((F.col("o_orderdate") >= lo)
                         & (F.col("o_orderdate") < hi)) \
        .select("o_orderkey", "o_custkey")
    li = cat.lineitem.where(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    c = cat.customer.select("c_custkey", "c_name", "c_nationkey")
    n = cat.nation.select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "fuzzy_partname_match",
    """
    WITH names AS (
        SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS block
        FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM names a
    JOIN names b ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_partname_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance join (entity-resolution staple): distinct part
    names, blocked on the final word so the quadratic levenshtein work is
    bucket-local (the same inverted-index discipline as every fuzzy join
    here), pairs within edit distance 2. Both engines implement classic
    Levenshtein — the scores are hash-compared, not just the pair set."""
    names = (
        Catalog(spark, sf_dir).part
        .select("p_name").distinct()
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("block"))
    b = names.select(F.col("p_name").alias("name_b"),
                     F.col("block").alias("block_b"))
    return (
        a.join(b, (F.col("block") == F.col("block_b"))
               & (F.col("name_a") < F.col("name_b")))
        .where(F.levenshtein("name_a", "name_b") <= 2)
        .select("name_a", "name_b",
                F.levenshtein("name_a", "name_b").cast("long")
                .alias("edit_dist"))
    )
