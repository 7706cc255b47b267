"""Core relational surface (SURVEY.md §2.2-§2.7) as oracle-matched queries.

The reference has no joins, no aggregates over data columns, no sorts over
data (§2.5, §2.4 "absent machinery") — its *declared* query surface is the
MongoDB index set (§2.3) plus the dedup merge. These queries demonstrate the
full relational surface the north-star engine exposes, each with the Catalyst
physical strategy we actually want (broadcast for dims, sort-merge for
fact-fact, AQE everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.hierarchy import (
    denormalized_orders,
    hierarchy_paths,
    hierarchy_rollup,
)
from hierarchical_graph_db_spark.queries import query

# --- flagship: hierarchical rollup (G5) --------------------------------------

FLAGSHIP_ORACLE = """
SELECT r_name,
       n_name,
       count(o_orderkey)                AS n_orders,
       round(sum(o_totalprice), 2)      AS total_price,
       CAST(grouping(r_name) * 2 + grouping(n_name) AS INT) AS lvl
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@query("flagship_hierarchy_rollup", FLAGSHIP_ORACLE)
def flagship_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region→nation ROLLUP over the star join — the G5 mailbox-hierarchy
    rollup re-expressed (user/folder ≙ region/nation). Dims broadcast; one
    shuffle on the grouping keys; all rollup levels in a single agg pass."""
    c = Catalog(spark, sf_dir)
    return hierarchy_rollup(denormalized_orders(c.region, c.nation, c.customer, c.orders))


# --- scans, filters, projections (P13/P14, Q3-Q6) ----------------------------


@query(
    "filter_project_pushdown",
    """
    SELECT o_orderkey,
           o_totalprice,
           CASE WHEN o_totalprice > 300000 THEN 'high' ELSE 'mid' END AS price_band
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND o_totalprice > 150000
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + value predicate and a 3-column projection: both must reach
    the parquet scan (PushedFilters + pruned ReadSchema — asserted in
    tests/test_plans.py). This is the reference's Q5 date-index query."""
    c = Catalog(spark, sf_dir)
    return (
        c.orders
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_totalprice") > 150000)
        )
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(F.col("o_totalprice") > 300000, "high").otherwise("mid")
            .alias("price_band"),
        )
    )


@query(
    "point_lookup",
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment "
    "FROM customer WHERE c_custkey = 42",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1/Q2 analog: unique-key equality lookup. At 100 TB this is served by
    partition pruning + parquet min/max skipping, not an index."""
    return Catalog(spark, sf_dir).customer.where(F.col("c_custkey") == 42)


@query(
    "scalar_string_funcs",
    """
    SELECT doc_id,
           upper(substring(text, 1, 16))               AS prefix_u,
           length(text)                                AS n_chars_actual,
           lower(trim(source))                         AS source_norm,
           substring(sha256(text), 1, 16)              AS text_sha_prefix,
           reverse(lang)                               AS lang_rev
    FROM documents
    WHERE doc_id < 200
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8-P11 scalar surface: trim/lower/substring/length/sha2 — all
    whole-stage-codegen expressions, no UDFs."""
    return (
        Catalog(spark, sf_dir).documents
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.upper(F.substring("text", 1, 16)).alias("prefix_u"),
            F.length("text").alias("n_chars_actual"),
            F.lower(F.trim(F.col("source"))).alias("source_norm"),
            F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("text_sha_prefix"),
            F.reverse(F.col("lang")).alias("lang_rev"),
        )
    )


@query(
    "dedupe_key_expr",
    """
    SELECT doc_id,
           coalesce(nullif(source, 'src0'),
                    'hash_' || sha256(substring(text, 1, 2000))) AS dedupe_key
    FROM documents
    """,
)
def dedupe_key_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: ``message_id or "hash_"+sha256(preview)`` coalesce pattern
    (parsing_agent.py:41-47), with the 2000-char preview cap
    (ingest_enron.py:119). 'src0' plays the missing-Message-ID role."""
    return Catalog(spark, sf_dir).documents.select(
        "doc_id",
        F.coalesce(
            F.nullif(F.col("source"), F.lit("src0")),
            F.concat(F.lit("hash_"), F.sha2(F.substring("text", 1, 2000), 256)),
        ).alias("dedupe_key"),
    )


# --- joins (§2.5: the full surface the reference lacks) ----------------------


@query(
    "join_broadcast_star",
    """
    SELECT r_name,
           c_mktsegment,
           CAST(count(*) AS BIGINT)        AS n_orders,
           round(sum(o_totalprice), 2)     AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, c_mktsegment
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of every dim: zero shuffles until the
    final group-by. The plan must show BroadcastHashJoin ×3 (test_plans)."""
    c = Catalog(spark, sf_dir)
    return (
        denormalized_orders(c.region, c.nation, c.customer, c.orders)
        .groupBy("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "join_fact_fact",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)                                  AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2)         AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (lineitem ⋈ orders): sort-merge/shuffle-hash
    territory — both sides shuffle on l_orderkey/o_orderkey. At 100 TB both
    tables would be bucketed on the order key making this shuffle-free."""
    c = Catalog(spark, sf_dir)
    return (
        c.lineitem.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
    )


@query(
    "join_semi",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — existence test without duplication (the 'already
    ingested?' half of the reference's upsert, SURVEY.md §2.5)."""
    c = Catalog(spark, sf_dir)
    big_orders = c.orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return (
        c.customer.join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_anti",
    """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers_without_orders
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    GROUP BY c_nationkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the ``$setOnInsert`` insert-half of A1 (rows whose key
    is absent from the target), SURVEY.md §2.5."""
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(c.orders.where(F.col("o_totalprice") > 450000)
                        .select("o_custkey"),
                        F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


@query(
    "join_outer_histogram",
    """
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def join_outer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving order-less customers (count=0 bucket), then
    a histogram — two aggs, the second tiny."""
    c = Catalog(spark, sf_dir)
    per_cust = (
        c.customer.join(c.orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# --- aggregations (§2.4 + absent machinery now present) ----------------------


@query(
    "agg_lineitem_pricing",
    """
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           CAST(count(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan-heavy partial-agg
    benchmark (map-side combine collapses 600k rows to 32×|groups|)."""
    li = Catalog(spark, sf_dir).lineitem
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_distinct_users",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT)               AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2)                   AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) — expands to a two-phase agg under the hood (distinct
    keys shuffle first); A4's counter semantics generalized."""
    return (
        Catalog(spark, sf_dir).events
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS lvl
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 4 grouping combinations in one pass."""
    return (
        Catalog(spark, sf_dir).orders
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("int").alias("lvl"),
        )
    )


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(count(*) AS BIGINT)    AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint single-dim sets — not a rollup)."""
    Catalog(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               count(*)                    AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# --- windows / sorts / limits (§2.6) -----------------------------------------


@query(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        FROM orders
        WHERE o_custkey < 50
    )
    WHERE rnk <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (deterministic tiebreak on key)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        Catalog(spark, sf_dir).orders
        .where(F.col("o_custkey") < 50)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@query(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_total
    FROM orders
    WHERE o_custkey < 20
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate with an explicit ROWS frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        Catalog(spark, sf_dir).orders
        .where(F.col("o_custkey") < 20)
        .select(
            "o_custkey", "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    )


@query(
    "sort_limit_topn",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge), never a full sort — the right shape at any scale."""
    return (
        Catalog(spark, sf_dir).orders
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- set operations (§2.7) ---------------------------------------------------

_SET_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"
_SET_B = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"


def _setop_frames(spark: SparkSession, sf_dir: str):
    cust = Catalog(spark, sf_dir).customer
    a = cust.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return a, b


@query("setop_union", f"{_SET_A} UNION {_SET_B}")
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_frames(spark, sf_dir)
    return a.union(b).distinct()


@query("setop_intersect", f"{_SET_A} INTERSECT {_SET_B}")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_frames(spark, sf_dir)
    return a.intersect(b)


@query("setop_except", f"{_SET_A} EXCEPT {_SET_B}")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_frames(spark, sf_dir)
    return a.exceptAll(b).distinct()


# --- array / map semantics (§2.7 array-level, A2) ----------------------------


@query(
    "array_set_semantics",
    """
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
)
def array_set_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2's ``$addToSet`` semantics: collect_set + array_sort (canonical
    order) + string join (engines hash arrays differently; strings don't)."""
    return (
        Catalog(spark, sf_dir).customer
        .groupBy("c_nationkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment")))
            .alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "json_extract_props",
    """
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON path extraction from the props column
    (the reference's dynamic-BSON analog, done relationally)."""
    k = F.get_json_object("props", "$.k")
    return (
        Catalog(spark, sf_dir).events
        .groupBy("event_type")
        .agg(
            F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
            F.max(k.cast("long")).alias("max_k"),
        )
    )


@query(
    "hierarchy_paths",
    """
    SELECT c_custkey,
           r_name || '/' || n_name || '/' || c_name AS path,
           r_name, n_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def hierarchy_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 companion: materialized region/nation/customer paths (the fixed
    3-level maildir walk base/<user>/<folder>/<file> re-expressed)."""
    c = Catalog(spark, sf_dir)
    return hierarchy_paths(c.region, c.nation, c.customer)


@query(
    "bloom_prune_join",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                     * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 450000
    GROUP BY o.o_orderpriority
    """,
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join reduced by an explicit Bloom-filter semi-join
    (``operators/bloom.py``): high-value orders' keys fold into an 8 KiB
    bitmap literal, every lineitem row tests its l_orderkey against it
    inside the scan's project, and only survivors reach the join shuffle.
    The oracle is the PLAIN join — the equivalence proof that Bloom
    pruning drops nothing (no false negatives), same oracle style as
    ``window_topk_salted``. At 100 TB this is the shape for build sides too
    big to broadcast as rows but whose key set fits a bitmap: the probe
    exchange shrinks by the filter's selectivity, the build pass shuffles
    O(m/64) words, and the bitmap collect is 8 KiB regardless of scale.
    Revenue sums cents as bigints (order-independent) before one division.
    """
    from hierarchical_graph_db_spark.operators.bloom import bloom_prune

    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(F.col("o_totalprice") > 450000) \
        .select("o_orderkey", "o_orderpriority")
    li = cat.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    pruned = bloom_prune(li, "l_orderkey", o, "o_orderkey")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100).cast("bigint")
    return (
        pruned.join(o, pruned.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.round(F.sum(cents) / F.lit(100.0), 2).alias("revenue"))
        .select("o_orderpriority", "n_items", "revenue")
    )


@query(
    "incremental_join_view_delta",
    """
    WITH so AS (SELECT o_orderkey, o_orderpriority FROM orders
                WHERE o_orderkey % 4 <> 0),
    do_ AS (SELECT o_orderkey, o_orderpriority FROM orders
            WHERE o_orderkey % 4 = 0),
    sl AS (SELECT l_orderkey, l_extendedprice FROM lineitem
           WHERE l_linenumber % 3 <> 0),
    dl AS (SELECT l_orderkey, l_extendedprice FROM lineitem
           WHERE l_linenumber % 3 = 0),
    old AS (SELECT o_orderpriority, l_extendedprice
            FROM sl JOIN so ON l_orderkey = o_orderkey),
    new AS (SELECT o_orderpriority, l_extendedprice
            FROM (SELECT * FROM sl UNION ALL SELECT * FROM dl) l
            JOIN (SELECT * FROM so UNION ALL SELECT * FROM do_) o
              ON l_orderkey = o_orderkey),
    delta AS (SELECT * FROM new EXCEPT ALL SELECT * FROM old)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents
    FROM delta GROUP BY o_orderpriority
    """,
)
def incremental_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized orders⋈lineitem view:
    both sides receive insert-only deltas (every 4th order, every 3rd
    line) and the operator computes EXACTLY the rows that must be
    appended — ΔL⋈O_new ∪ L_old⋈ΔO, O(|Δ|⋈) instead of a recompute
    (operators/maintenance.py:incremental_join_delta). The oracle is the
    EQUIVALENCE PROOF, not a replay: it derives the delta as
    (new join) EXCEPT ALL (old join) — multiset difference — so a
    double-counted (ΔL⋈ΔO twice) or missed term hash-mismatches.
    Aggregated per priority with cent-exact sums to keep the checked
    output bounded."""
    from hierarchical_graph_db_spark.operators.maintenance import (
        incremental_join_delta,
    )

    cat = Catalog(spark, sf_dir)
    o = cat.orders.select("o_orderkey", "o_orderpriority")
    li = cat.lineitem.select("l_orderkey", "l_extendedprice", "l_linenumber")
    so = o.where(F.col("o_orderkey") % 4 != 0)
    do = o.where(F.col("o_orderkey") % 4 == 0)
    sl = li.where(F.col("l_linenumber") % 3 != 0) \
        .select("l_orderkey", "l_extendedprice")
    dl = li.where(F.col("l_linenumber") % 3 == 0) \
        .select("l_orderkey", "l_extendedprice")
    delta = incremental_join_delta(
        sl, dl, so, do,
        on=F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        delta.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
             .cast("bigint").alias("price_cents"))
    )


# --- 2-D skyline (Pareto frontier) -------------------------------------------


@query(
    "skyline_price_size",
    """
    WITH pts AS (
        SELECT p_retailprice AS price, p_size AS size,
               CAST(count(*) AS BIGINT) AS n_parts,
               min(p_partkey) AS min_partkey
        FROM part GROUP BY 1, 2
    )
    SELECT price, size, n_parts, min_partkey
    FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.price <= a.price AND b.size >= a.size
          AND (b.price < a.price OR b.size > a.size)
    )
    """,
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts — cheapest price at every dominating size
    ("no other part is both cheaper and at least as large"). The engine
    plan (operators/frontier.py:skyline_2d) is distinct-point collapse →
    bucket-prefix-max coarse prune (broadcast) → per-x champion → one
    ordered pass over the pruned near-frontier set; the oracle is the
    textbook all-pairs NOT EXISTS — an independent formulation, so an
    over-pruning bucket filter or a wrong strictness rule hash-mismatches."""
    from hierarchical_graph_db_spark.operators.frontier import skyline_2d

    p = Catalog(spark, sf_dir).part
    return skyline_2d(
        p.select(F.col("p_retailprice").alias("price"),
                 F.col("p_size").alias("size"), "p_partkey"),
        "price", "size",
        payload={"n_parts": F.count(F.lit(1)).cast("bigint"),
                 "min_partkey": F.min("p_partkey")},
        bucket=F.floor(F.col("price") / 100),
    )


# --- higher-order array functions (transform/filter/exists/zip_with/fold) ----


@query(
    "array_hof_metrics",
    """
    WITH lists AS (
        SELECT user_id,
               list(CAST(round(value * 100) AS BIGINT)
                    ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(l) AS BIGINT) AS n,
           CAST(list_sum(l) AS BIGINT) AS total_cents,
           CAST(len(list_filter(l, x -> x > 5000)) AS BIGINT) AS n_large,
           len(list_filter(l, x -> x < 0)) > 0 AS any_negative,
           CAST(list_sum(list_sort(l, 'DESC')[1:3]) AS BIGINT)
               AS top3_cents,
           CAST(list_max(list_zip(l[2:], l[:-1])
                         .apply(t -> t[1] - t[2])) AS BIGINT) AS max_jump
    FROM lists
    """,
)
def array_hof_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order array-function surface in one query — transform-
    free fold (aggregate), filter, exists, zip_with over a shifted copy
    (adjacent deltas WITHOUT a positional self-join), sort+slice — over
    each user's time-ordered value sequence. The list itself is built
    deterministically (sort_array of (ts, event_id, cents) structs, then
    projected), because collect_list order is partition-dependent. All
    element math is integer cents, so the fold needs no float-order care.
    HOFs evaluate inside the project after ONE groupBy — the array is the
    per-key state, the classic Spark substitute for per-row UDF loops."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    lists = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "cents"))),
            lambda s: s["cents"]).alias("l"))
    l = F.col("l")
    n1 = F.size(l) - 1
    diffs = F.zip_with(F.slice(l, 2, n1), F.slice(l, 1, n1),
                       lambda a, b: a - b)
    return lists.select(
        "user_id",
        F.size(l).cast("bigint").alias("n"),
        F.aggregate(l, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("total_cents"),
        F.size(F.filter(l, lambda x: x > 5000)).cast("bigint")
        .alias("n_large"),
        F.exists(l, lambda x: x < 0).alias("any_negative"),
        F.aggregate(F.slice(F.sort_array(l, asc=False), 1, 3),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("top3_cents"),
        F.array_max(diffs).cast("bigint").alias("max_jump"),
    )


# --- NULL semantics (3-valued logic) and date arithmetic surfaces -----------


@query(
    "null_semantics_matrix",
    """
    WITH t AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_totalprice END AS price,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_orderpriority END AS prio
        FROM orders
    )
    SELECT coalesce(prio, '<null>') AS prio,
           CAST(count(*) AS BIGINT)      AS n_rows,
           CAST(count(price) AS BIGINT)  AS n_price,
           round(sum(price), 2)          AS sum_price,
           round(avg(price), 4)          AS avg_price,
           CAST(sum(CASE WHEN price IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq,
           CAST(sum(CASE WHEN price > 100000 THEN 1
                         WHEN NOT (price > 100000) THEN 0
                         ELSE -1 END) AS BIGINT)       AS three_vl_sum
    FROM t
    GROUP BY prio
    """,
)
def null_semantics_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic semantics pinned cross-engine: COUNT(*) vs
    COUNT(col) under nulls, null-skipping SUM/AVG, null-safe equality
    (<=> / IS NOT DISTINCT FROM), and a predicate whose TRUE/FALSE/UNKNOWN
    branches are each counted — the parts of ANSI null semantics that
    silently diverge between engines when anything is off. Nulls are
    synthesized deterministically from the key so both engines see the
    identical table."""
    o = Catalog(spark, sf_dir).orders
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice")).alias("price"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority")).alias("prio"),
    )
    gt = F.col("price") > 100000
    return t.groupBy(F.coalesce("prio", F.lit("<null>")).alias("prio")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price").alias("n_price"),
        F.round(F.sum("price"), 2).alias("sum_price"),
        F.round(F.avg("price"), 4).alias("avg_price"),
        F.sum(F.when(F.col("price").eqNullSafe(F.lit(None).cast("double")),
                     1).otherwise(0)).cast("bigint").alias("n_null_safe_eq"),
        F.sum(F.when(gt, 1).when(~gt, 0).otherwise(-1)).cast("bigint")
        .alias("three_vl_sum"),
    )


@query(
    "date_arithmetic_functions",
    """
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
               AS plus_30d,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_part('isodow', o_orderdate) AS BIGINT) AS iso_dow,
           CAST(date_part('week', o_orderdate) AS BIGINT)   AS iso_week,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '1998-12-01') AS BIGINT)     AS days_to_eoy,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
    FROM orders
    GROUP BY o_orderdate
    """,
)
def date_arithmetic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calendar-arithmetic scalar surface, pinned cross-engine on safe
    common semantics: day addition, last_day, ISO day-of-week/week number,
    day difference to a fixed anchor, quarter truncation. (months_between
    and week-of-year WITHOUT iso rules differ between engines by design —
    deliberately excluded; iso_dow/iso_week are the portable forms.)"""
    o = Catalog(spark, sf_dir).orders
    d = F.to_date("o_orderdate")
    return (
        o.groupBy(F.col("o_orderdate"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            d.alias("d"), "n",
            F.date_add(d, 30).alias("plus_30d"),
            F.last_day(d).alias("month_end"),
            F.dayofweek(F.date_sub(d, 1)).cast("bigint").alias("iso_dow"),
            F.weekofyear(d).cast("bigint").alias("iso_week"),
            F.datediff(F.lit("1998-12-01").cast("date"), d).cast("bigint")
            .alias("days_to_eoy"),
            F.trunc(d, "quarter").alias("quarter_start"),
        )
    )


# --- customer RFM segmentation and ABC analysis ------------------------------


@query(
    "customer_rfm_segments",
    """
    WITH agg AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, last_order, frequency, monetary_cents,
               ntile(5) OVER (ORDER BY last_order, o_custkey) AS r,
               ntile(5) OVER (ORDER BY frequency, o_custkey) AS f,
               ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS m
        FROM agg
    )
    SELECT o_custkey, frequency,
           round(monetary_cents / 100.0, 2) AS monetary,
           CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
               AS rfm
    FROM scored
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency/frequency/monetary quintiles — the
    classic CRM scoring): per-customer order aggregates, three ntile(5)
    rankings with the customer key as tie-break (deterministic quintile
    edges), concatenated into the familiar '555'-style segment code. The
    windows run over the per-customer aggregate (one row each), never the
    fact; at scale the three global sorts become range-partitioned
    TeraSort shapes on a table 1/|orders-per-customer| the fact size."""
    from pyspark.sql import Window

    o = Catalog(spark, sf_dir).orders
    agg = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint").alias("monetary_cents"))
    r = F.ntile(5).over(Window.orderBy("last_order", "o_custkey"))
    fq = F.ntile(5).over(Window.orderBy("frequency", "o_custkey"))
    m = F.ntile(5).over(Window.orderBy("monetary_cents", "o_custkey"))
    return agg.select(
        "o_custkey", "frequency",
        F.round(F.col("monetary_cents") / 100.0, 2).alias("monetary"),
        r.cast("bigint").alias("r"), fq.cast("bigint").alias("f"),
        m.cast("bigint").alias("m"),
    ).withColumn("rfm", F.concat(F.col("r").cast("string"),
                                 F.col("f").cast("string"),
                                 F.col("m").cast("string")))


@query(
    "part_abc_analysis",
    """
    WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, cents,
               sum(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS run_cents,
               sum(cents) OVER () AS tot_cents
        FROM rev
    )
    SELECT l_partkey, round(cents / 100.0, 2) AS revenue,
           round(run_cents / CAST(tot_cents AS DOUBLE), 6) AS cum_share,
           CASE WHEN run_cents / CAST(tot_cents AS DOUBLE) <= 0.8 THEN 'A'
                WHEN run_cents / CAST(tot_cents AS DOUBLE) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def part_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis of part revenue: rank parts by discounted
    revenue, classify by cumulative share (A ≤ 80%, B ≤ 95%, C tail) —
    the inventory-management classic. Revenue and the running total are
    exact integer cents (the cumulative window is an integer prefix sum —
    no float order anywhere); windows run over one row per part. The
    global ordered window is the documented bounded-aggregate-table class
    (|parts| rows); at fact scale it becomes a range-partitioned sort."""
    from pyspark.sql import Window

    li = Catalog(spark, sf_dir).lineitem
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * 100).cast("bigint")).cast("bigint").alias("cents"))
    w = Window.orderBy(F.desc("cents"), F.asc("l_partkey")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy()
    share = F.col("run_cents") / F.col("tot_cents").cast("double")
    return (
        rev.withColumn("run_cents", F.sum("cents").over(w))
        .withColumn("tot_cents", F.sum("cents").over(tot))
        .select("l_partkey",
                F.round(F.col("cents") / 100.0, 2).alias("revenue"),
                F.round(share, 6).alias("cum_share"),
                F.when(share <= 0.8, "A")
                .when(share <= 0.95, "B").otherwise("C").alias("abc_class"))
    )


@query(
    "supplier_balance_profile",
    """
    WITH s AS (
        SELECT s_suppkey, s_nationkey,
               CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
        FROM supplier
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(bal_cents) / 100.0, 2) AS total_balance,
           round(sum(bal_cents) / 100.0 / count(*), 4) AS avg_balance,
           round(min(bal_cents) / 100.0, 2) AS min_balance,
           round(max(bal_cents) / 100.0, 2) AS max_balance,
           CAST(sum(CASE WHEN bal_cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative
    FROM s JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def supplier_balance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance profile per nation (count, exact-cent
    total/avg/min/max, negative-balance count) — the supplier-side
    completeness query beside the TPC-H shapes; the dim broadcasts, all
    money math is integer cents divided once."""
    c = Catalog(spark, sf_dir)
    s = c.supplier.select(
        "s_suppkey", "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("bal_cents"))
    return (
        s.join(F.broadcast(c.nation),
               s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"),
             F.round(F.sum("bal_cents") / 100.0, 2).alias("total_balance"),
             F.round(F.sum("bal_cents") / 100.0 / F.count(F.lit(1)), 4)
             .alias("avg_balance"),
             F.round(F.min("bal_cents") / 100.0, 2).alias("min_balance"),
             F.round(F.max("bal_cents") / 100.0, 2).alias("max_balance"),
             F.sum(F.when(F.col("bal_cents") < 0, 1).otherwise(0))
             .cast("bigint").alias("n_negative"))
    )
