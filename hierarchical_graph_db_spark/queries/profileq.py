"""Data-quality profile query over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.profiling import profile
from hierarchical_graph_db_spark.queries import query


@query(
    "profile_documents",
    """
    SELECT 'doc_id' AS column, CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_repr, CAST(max(doc_id) AS VARCHAR) AS max_repr
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT), min(lang), max(lang)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT), min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile (nulls, cardinality, range) — the ingest
    quality gate, all columns in a single aggregation."""
    docs = Catalog(spark, sf_dir).documents
    return profile(docs, ["doc_id", "lang", "source", "n_chars"])


@query(
    "chi_square_independence",
    """
    WITH joined AS (
        SELECT c.c_mktsegment AS segment, e.event_type
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    ),
    obs AS (SELECT segment, event_type, count(*) AS o
            FROM joined GROUP BY segment, event_type),
    rt  AS (SELECT segment, sum(o) AS row_tot FROM obs GROUP BY segment),
    ct  AS (SELECT event_type, sum(o) AS col_tot FROM obs GROUP BY event_type),
    n   AS (SELECT sum(o) AS total FROM obs)
    SELECT round(sum(
               pow(o - (row_tot * col_tot / CAST(total AS DOUBLE)), 2)
               / (row_tot * col_tot / CAST(total AS DOUBLE))), 4) AS chi2,
           CAST((count(DISTINCT obs.segment) - 1)
                * (count(DISTINCT obs.event_type) - 1) AS BIGINT) AS dof
    FROM obs JOIN rt ON obs.segment = rt.segment
             JOIN ct ON obs.event_type = ct.event_type
             CROSS JOIN n
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence for event_type × customer
    segment — the data-profiling statistic for 'is this feature correlated
    with that label'. The contingency table is one hash aggregate; row and
    column marginals re-aggregate *the table* (|segments|×|types| rows, not
    the raw events) and broadcast back; the statistic folds in a final
    1-row aggregate. Nothing rescans the fact."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.select("user_id", "event_type")
    dim = cat.customer.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    obs = (
        ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = obs.groupBy("segment").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("event_type").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("total"))
    expected = (F.col("row_tot") * F.col("col_tot")
                / F.col("total").cast("double"))
    return (
        obs.join(F.broadcast(rt), "segment")
        .join(F.broadcast(ct), "event_type")
        .join(F.broadcast(n))
        .agg(
            F.round(F.sum(F.pow(F.col("o") - expected, 2) / expected), 4)
            .alias("chi2"),
            ((F.countDistinct("segment") - 1)
             * (F.countDistinct("event_type") - 1)).alias("dof"),
        )
    )


@query(
    "value_feature_correlations",
    """
    SELECT event_type,
           round(corr(value, CAST(hour(ts) AS DOUBLE)), 5)  AS corr_hour,
           round(corr(value, CAST(day(ts) AS DOUBLE)), 5)   AS corr_day,
           CAST(count(*) AS BIGINT)                          AS n
    FROM events
    GROUP BY event_type
    """,
)
def value_feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Pearson correlation of value against time-derived features
    (hour of day, day of month) — the feature-screening statistic of a
    training pipeline. corr() is a single-pass streaming aggregate in both
    engines (sum/sum-sq/cross moments), one hash aggregate total. Features
    chosen for identical cross-engine semantics (DuckDB and Spark disagree
    on day-of-week numbering; hour/day do not)."""
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", F.hour("ts").cast("double")), 5)
        .alias("corr_hour"),
        F.round(F.corr("value", F.dayofmonth("ts").cast("double")), 5)
        .alias("corr_day"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "drift_psi_value",
    """
    WITH bounds AS (
        SELECT min(value) AS vmin, max(value) AS vmax FROM events
    ),
    binned AS (
        SELECT event_type,
               CAST(least(floor((value - vmin) * 10.0
                                / (CASE WHEN vmax = vmin THEN 1.0
                                        ELSE vmax - vmin END)), 9)
                    AS BIGINT) AS bin,
               ts >= TIMESTAMP '2024-01-16' AS is_b
        FROM events, bounds
    ),
    per_bin AS (
        SELECT event_type, bin,
               count(*) FILTER (WHERE NOT is_b) AS n_a,
               count(*) FILTER (WHERE is_b)     AS n_b
        FROM binned GROUP BY event_type, bin
    ),
    tot AS (
        SELECT event_type, sum(n_a) AS tot_a, sum(n_b) AS tot_b
        FROM per_bin GROUP BY event_type
    )
    SELECT p.event_type,
           round(sum(
               ((n_a + 1.0) / (tot_a + 10.0) - (n_b + 1.0) / (tot_b + 10.0))
               * ln(((n_a + 1.0) / (tot_a + 10.0))
                    / ((n_b + 1.0) / (tot_b + 10.0)))), 6) AS psi
    FROM per_bin p JOIN tot t ON p.event_type = t.event_type
    GROUP BY p.event_type
    """,
)
def drift_psi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the value distribution, first half of
    the month vs second — the standard drift alarm (PSI > 0.2 ⇒
    investigate). Ten equi-width bins off a broadcast global min/max,
    add-one smoothing so empty bins stay finite (+bins in the denominator
    keeps shares normalized), and the whole statistic folds into two hash
    aggregates over the binned counts — the fact scans once."""
    ev = Catalog(spark, sf_dir).events
    bounds = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    span = F.when(F.col("vmax") == F.col("vmin"), F.lit(1.0)) \
        .otherwise(F.col("vmax") - F.col("vmin"))
    bin_col = F.least(
        F.floor((F.col("value") - F.col("vmin")) * 10.0 / span),
        F.lit(9),
    ).cast("long")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    per_bin = (
        ev.join(F.broadcast(bounds))
        .select("event_type", bin_col.alias("bin"),
                (F.col("ts") >= cutoff).alias("is_b"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(~F.col("is_b"), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("is_b"), 1).otherwise(0)).alias("n_b"),
        )
    )
    tot = per_bin.groupBy("event_type").agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b"))
    pa = (F.col("n_a") + 1.0) / (F.col("tot_a") + 10.0)
    pb = (F.col("n_b") + 1.0) / (F.col("tot_b") + 10.0)
    return (
        per_bin.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"))
    )


# ---------------------------------------------------------------------------
# Z-order vs linear file skipping (the measurable case for zorder_compact)
# ---------------------------------------------------------------------------

_ZBITS = 6
_ZBOX = (8, 15, 8, 15)  # x_lo, x_hi, y_lo, y_hi

#: Bit-interleave of the low 6 bits of (x, y) in portable arithmetic —
#: the SQL twin of operators/maintenance.py:zorder_value (x on odd bits).
_Z_EXPR = " + ".join(
    f"(((x // {2 ** i}) % 2) * {2 ** (2 * i + 1)})"
    f" + (((y // {2 ** i}) % 2) * {2 ** (2 * i)})"
    for i in range(_ZBITS)
)


def _layout_cte(src: str, label: str) -> str:
    x_lo, x_hi, y_lo, y_hi = _ZBOX
    cand = (f"min_x <= {x_hi} AND max_x >= {x_lo} "
            f"AND min_y <= {y_hi} AND max_y >= {y_lo}")
    return f"""
        SELECT '{label}' AS layout,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN {cand} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_candidate_files,
               CAST(sum(n_rows) AS BIGINT) AS rows_total,
               CAST(sum(CASE WHEN {cand} THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_candidate
        FROM {src}
    """


@query(
    "zorder_file_skipping",
    f"""
    WITH pts AS (
        SELECT user_id % 64 AS x, day(ts) AS y FROM events
    ),
    a AS (
        SELECT x, y, x AS file_lin, ({_Z_EXPR}) // 64 AS file_z FROM pts
    ),
    lin AS (
        SELECT file_lin AS file_id, min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y, count(*) AS n_rows
        FROM a GROUP BY file_lin
    ),
    zst AS (
        SELECT file_z AS file_id, min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y, count(*) AS n_rows
        FROM a GROUP BY file_z
    ),
    ls AS ({_layout_cte("lin", "linear")}),
    zs AS ({_layout_cte("zst", "zorder")})
    SELECT layout, n_files, n_candidate_files, rows_total, rows_candidate,
           round(1 - rows_candidate / rows_total, 6) AS skip_fraction
    FROM (SELECT * FROM ls UNION ALL SELECT * FROM zs) u
    """,
)
def zorder_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max file-skipping selectivity of the box predicate
    (user_id%64, day-of-month) ∈ [8,15]² under linear vs Z-order file
    layouts — the stats pass a reader's footer pruning would do, showing
    why the Z-ordered write (operators/maintenance.py:zorder_compact)
    skips what 1-D clustering can't. Pure arithmetic file assignment +
    two map-side-collapsing aggregates; no sort, no window."""
    from hierarchical_graph_db_spark.operators.maintenance import (
        file_skipping_stats,
    )

    ev = Catalog(spark, sf_dir).events
    return file_skipping_stats(
        ev, x=F.col("user_id") % 64, y=F.dayofmonth("ts"),
        box=_ZBOX, bits=_ZBITS)


# ---------------------------------------------------------------------------
# Association rules (A-priori pair level) over daily user baskets
# ---------------------------------------------------------------------------


@query(
    "assoc_rules_event_pairs",
    """
    WITH baskets AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
               event_type AS item
        FROM events
    ),
    nb AS (
        SELECT CAST(count(*) AS BIGINT) AS n_baskets
        FROM (SELECT DISTINCT user_id, day FROM baskets) t
    ),
    supp AS (
        SELECT item, CAST(count(*) AS BIGINT) AS item_count
        FROM baskets GROUP BY item
    ),
    pairs AS (
        SELECT a.item AS antecedent, b.item AS consequent,
               CAST(count(*) AS BIGINT) AS pair_count
        FROM baskets a
        JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
                      AND a.item <> b.item
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT antecedent, consequent, pair_count,
           round(pair_count / n_baskets, 6) AS support,
           round(pair_count / sa.item_count, 6) AS confidence,
           round((pair_count * n_baskets)
                 / (sa.item_count * sc.item_count), 6) AS lift
    FROM pairs
    JOIN supp sa ON sa.item = antecedent
    JOIN supp sc ON sc.item = consequent
    CROSS JOIN nb
    """,
)
def assoc_rules_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level association rules (Agrawal & Srikant 1994) over daily
    (user, day) event-type baskets: support / confidence / lift per ordered
    pair. The pair self-join is co-partitioned on the basket key; the
    support sides broadcast — see operators/assoc.py for the 100 TB
    shape."""
    from hierarchical_graph_db_spark.operators.assoc import (
        pair_association_rules,
    )

    return pair_association_rules(Catalog(spark, sf_dir).events)


# ---------------------------------------------------------------------------
# Declarative constraint suite (Deequ / Great Expectations pattern)
# ---------------------------------------------------------------------------


@query(
    "quality_constraint_suite",
    """
    WITH agg AS (
        SELECT count(*)                  AS n,
               count(event_id)           AS n_eid,
               count(value)              AS n_val,
               count(DISTINCT event_id)  AS d_eid,
               sum(CASE WHEN event_type IN
                   ('click','error','purchase','signup','view')
                   THEN 1 ELSE 0 END)    AS n_inset,
               sum(CASE WHEN value BETWEEN 0 AND 300
                   THEN 1 ELSE 0 END)    AS n_rng,
               sum(CASE WHEN regexp_matches(props, '^\\{.*\\}$')
                   THEN 1 ELSE 0 END)    AS n_re
        FROM events
    ),
    ri AS (
        SELECT count(*) AS n, count(c.c_custkey) AS n_m
        FROM events e
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
               ON e.user_id = c.c_custkey
    )
    SELECT 'completeness' AS "check", 'event_id' AS "column",
           coalesce(round(n_eid / n, 6), 1.0) AS observed,
           CAST(1.0 AS DOUBLE) AS threshold,
           coalesce(round(n_eid / n, 6), 1.0) >= 1.0 AS passed FROM agg
    UNION ALL
    SELECT 'completeness', 'value', coalesce(round(n_val / n, 6), 1.0), CAST(0.99 AS DOUBLE),
           coalesce(round(n_val / n, 6), 1.0) >= 0.99 FROM agg
    UNION ALL
    SELECT 'uniqueness', 'event_id', coalesce(round(d_eid / n_eid, 6), 1.0),
           CAST(1.0 AS DOUBLE), coalesce(round(d_eid / n_eid, 6), 1.0) >= 1.0 FROM agg
    UNION ALL
    SELECT 'in_set', 'event_type', coalesce(round(n_inset / n, 6), 1.0), CAST(1.0 AS DOUBLE),
           coalesce(round(n_inset / n, 6), 1.0) >= 1.0 FROM agg
    UNION ALL
    SELECT 'in_range', 'value', coalesce(round(n_rng / n, 6), 1.0), CAST(0.999 AS DOUBLE),
           coalesce(round(n_rng / n, 6), 1.0) >= 0.999 FROM agg
    UNION ALL
    SELECT 'matches', 'props', coalesce(round(n_re / n, 6), 1.0), CAST(1.0 AS DOUBLE),
           coalesce(round(n_re / n, 6), 1.0) >= 1.0 FROM agg
    UNION ALL
    SELECT 'ref_integrity', 'user_id', coalesce(round(n_m / n, 6), 1.0), CAST(1.0 AS DOUBLE),
           coalesce(round(n_m / n, 6), 1.0) >= 1.0 FROM ri
    """,
)
def quality_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the events batch (the Deequ /
    Great Expectations pattern, Schelter et al. VLDB 2018 — public method):
    seven declared constraints, six of which evaluate in ONE scan + ONE
    aggregation (completeness ×2, key uniqueness, value-set membership,
    range compliance, regex shape), plus a referential-integrity pass
    joining the fact's user_id against the customer key set (broadcast —
    it's a key set, not the dim). The in_range threshold (0.999) is
    deliberately above the data's compliance so the report exercises the
    fail branch. Every observed metric is a ratio of bigint counts rounded
    to 6 dp — no float-order sensitivity. At 100 TB: the per-table suite is
    a single map-side-combining aggregation regardless of check count; see
    operators/checks.py for the uniqueness-via-sketch swap."""
    from hierarchical_graph_db_spark.operators import checks as C

    cat = Catalog(spark, sf_dir)
    ev = cat.events
    suite = [
        C.completeness("event_id", 1.0),
        C.completeness("value", 0.99),
        C.uniqueness("event_id", 1.0),
        C.in_set("event_type",
                 ["click", "error", "purchase", "signup", "view"], 1.0),
        C.in_range("value", 0.0, 300.0, 0.999),
        C.matches("props", "^\\{.*\\}$", 1.0),
    ]
    report = C.run_checks(ev, suite)
    ri = C.referential_integrity(
        ev, "user_id", cat.customer, "c_custkey", 1.0)
    return report.unionByName(ri)


@query(
    "item_item_cosine",
    """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem
    ),
    s AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY item),
    p AS (
        SELECT a.item AS i, c.item AS j, CAST(count(*) AS BIGINT)
                   AS pair_count
        FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
        GROUP BY a.item, c.item
        HAVING count(*) >= 2
    ),
    bidir AS (
        SELECT i, j, pair_count FROM p
        UNION ALL
        SELECT j, i, pair_count FROM p
    )
    SELECT item, neighbor, pair_count, cosine, rnk FROM (
        SELECT bidir.i AS item, bidir.j AS neighbor, pair_count,
               round(pair_count / sqrt(si.c * CAST(sj.c AS DOUBLE)), 6)
                   AS cosine,
               CAST(row_number() OVER (
                   PARTITION BY bidir.i
                   ORDER BY round(pair_count
                                  / sqrt(si.c * CAST(sj.c AS DOUBLE)), 6)
                            DESC, bidir.j) AS BIGINT) AS rnk
        FROM bidir
        JOIN s si ON si.item = bidir.i
        JOIN s sj ON sj.item = bidir.j
    ) WHERE rnk <= 3
    """,
)
def item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order baskets (Sarwar et al.
    2001): parts co-purchased in the same order score
    c_ij / sqrt(c_i·c_j); each part keeps its top-3 neighbors with
    pair_count >= 2 support — the "bought X, also bought Y" table. Pair
    counting self-joins CO-PARTITIONED on the order key (quadratic only in
    per-order distinct parts; the mega-basket guard is the scale lever),
    supports broadcast back, and the per-item top-k window pre-truncates
    map-side via WindowGroupLimit. See operators/assoc.py."""
    from hierarchical_graph_db_spark.operators.assoc import (
        item_item_cosine_topk,
    )

    li = Catalog(spark, sf_dir).lineitem
    return item_item_cosine_topk(
        li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey",
        k=3, min_pair_count=2)


@query(
    "conversion_wilson_ci",
    """
    WITH u AS (
        SELECT e.user_id, c.c_mktsegment AS segment,
               max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY e.user_id, c.c_mktsegment
    ),
    agg AS (
        SELECT segment,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM u GROUP BY segment
    )
    SELECT segment, n_users, n_converted,
           round(n_converted / CAST(n_users AS DOUBLE), 6) AS conv_rate,
           round(((n_converted / CAST(n_users AS DOUBLE))
                  + 1.9208 / n_users
                  - 1.96 * sqrt(((n_converted / CAST(n_users AS DOUBLE))
                                 * (1 - n_converted / CAST(n_users AS DOUBLE))
                                 + 0.9604 / n_users) / n_users))
                 / (1 + 3.8416 / n_users), 6) AS ci_low,
           round(((n_converted / CAST(n_users AS DOUBLE))
                  + 1.9208 / n_users
                  + 1.96 * sqrt(((n_converted / CAST(n_users AS DOUBLE))
                                 * (1 - n_converted / CAST(n_users AS DOUBLE))
                                 + 0.9604 / n_users) / n_users))
                 / (1 + 3.8416 / n_users), 6) AS ci_high
    FROM agg
    """,
)
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment conversion rate with a Wilson 95% score interval
    (Wilson 1927, public method — the standard A/B-test interval because
    it behaves at small n and extreme p, unlike the Wald interval):
    conversion = share of a segment's active users with ≥1 purchase.
    Two hash aggregates (user-level flag via max, then segment rollup —
    both partial-aggregable on their keys) and the interval is pure
    per-row arithmetic on the integer counts: z=1.96 constants are folded
    (z²=3.8416, z²/2=1.9208, z²/4=0.9604), identical IEEE evaluation in
    both engines, 6-dp rounding."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.select("user_id", "event_type")
    dim = cat.customer.select("c_custkey",
                              F.col("c_mktsegment").alias("segment"))
    u = (
        ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
        .groupBy("user_id", "segment")
        .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0)).alias("converted"))
    )
    agg = u.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    p = F.col("n_converted") / F.col("n_users").cast("double")
    n = F.col("n_users")
    half = F.lit(1.96) * F.sqrt((p * (1 - p) + F.lit(0.9604) / n) / n)
    center = p + F.lit(1.9208) / n
    denom = 1 + F.lit(3.8416) / n
    return agg.select(
        "segment", "n_users", "n_converted",
        F.round(p, 6).alias("conv_rate"),
        F.round((center - half) / denom, 6).alias("ci_low"),
        F.round((center + half) / denom, 6).alias("ci_high"),
    )


@query(
    "drift_ks_two_sample",
    """
    WITH bounds AS (
        SELECT min(value) AS vmin, max(value) AS vmax FROM events
    ),
    binned AS (
        SELECT event_type,
               CAST(least(floor((value - vmin) * 1000.0
                                / (CASE WHEN vmax = vmin THEN 1.0
                                        ELSE vmax - vmin END)), 999)
                    AS BIGINT) AS bin,
               ts >= TIMESTAMP '2024-01-16' AS is_b
        FROM events, bounds
    ),
    per_bin AS (
        SELECT event_type, bin,
               CAST(count(*) FILTER (WHERE NOT is_b) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (WHERE is_b) AS BIGINT)     AS n_b
        FROM binned GROUP BY event_type, bin
    ),
    cum AS (
        SELECT event_type, bin,
               sum(n_a) OVER (PARTITION BY event_type ORDER BY bin) AS ca,
               sum(n_b) OVER (PARTITION BY event_type ORDER BY bin) AS cb,
               sum(n_a) OVER (PARTITION BY event_type) AS ta,
               sum(n_b) OVER (PARTITION BY event_type) AS tb
        FROM per_bin
    )
    SELECT event_type,
           round(max(abs(ca / CAST(ta AS DOUBLE)
                         - cb / CAST(tb AS DOUBLE))), 6) AS ks_stat,
           CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b,
           round(1.358 * sqrt((max(ta) + max(tb))
                              / (max(ta) * CAST(max(tb) AS DOUBLE))), 6)
               AS crit_05,
           max(abs(ca / CAST(ta AS DOUBLE) - cb / CAST(tb AS DOUBLE)))
           > 1.358 * sqrt((max(ta) + max(tb))
                          / (max(ta) * CAST(max(tb) AS DOUBLE))) AS drifted
    FROM cum GROUP BY event_type
    """,
)
def drift_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event type (public
    statistic; Massey 1951): D = max |ECDF_first_half − ECDF_second_half|
    of the value distribution over 1000 equi-width bins, against the
    α=0.05 critical value 1.358·√((n_a+n_b)/(n_a·n_b)) — the
    distribution-shape alarm beside PSI's population-share alarm.
    Binning FIRST is the scale shape: the cumulative windows then run
    over ≤1000 bin rows per type (bounded state, same class as the
    top-k windows), never over raw values, and the bin counts themselves
    partial-aggregate map-side. ECDF differences are ratios of exact
    integer cumulative counts — identical IEEE doubles cross-engine."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    bounds = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    span = F.when(F.col("vmax") == F.col("vmin"), F.lit(1.0)) \
        .otherwise(F.col("vmax") - F.col("vmin"))
    bin_col = F.least(
        F.floor((F.col("value") - F.col("vmin")) * 1000.0 / span),
        F.lit(999)).cast("long")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    per_bin = (
        ev.join(F.broadcast(bounds))
        .select("event_type", bin_col.alias("bin"),
                (F.col("ts") >= cutoff).alias("is_b"))
        .groupBy("event_type", "bin")
        .agg(F.sum(F.when(~F.col("is_b"), 1).otherwise(0))
             .cast("bigint").alias("n_a"),
             F.sum(F.when(F.col("is_b"), 1).otherwise(0))
             .cast("bigint").alias("n_b"))
    )
    wo = Window.partitionBy("event_type").orderBy("bin")
    wt = Window.partitionBy("event_type")
    cum = per_bin.select(
        "event_type",
        F.sum("n_a").over(wo).alias("ca"), F.sum("n_b").over(wo).alias("cb"),
        F.sum("n_a").over(wt).alias("ta"), F.sum("n_b").over(wt).alias("tb"),
    )
    diff = F.abs(F.col("ca") / F.col("ta").cast("double")
                 - F.col("cb") / F.col("tb").cast("double"))
    crit = F.lit(1.358) * F.sqrt(
        (F.max("ta") + F.max("tb"))
        / (F.max("ta") * F.max("tb").cast("double")))
    return cum.groupBy("event_type").agg(
        F.round(F.max(diff), 6).alias("ks_stat"),
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
        F.round(crit, 6).alias("crit_05"),
        (F.max(diff) > crit).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# Robust outlier profiling: median / MAD modified z-scores
# ---------------------------------------------------------------------------


@query(
    "anomaly_mad_outliers",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mads AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    ),
    scored AS (
        SELECT d.event_type, d.med, m.mad,
               CASE WHEN m.mad > 0
                    THEN round(0.6745 * d.adev / m.mad, 6) END AS mod_z
        FROM dev d JOIN mads m USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN mod_z > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           round(min(med), 4) AS med,
           round(min(mad), 4) AS mad,
           round(max(mod_z), 6) AS max_mod_z
    FROM scored
    GROUP BY event_type
    """,
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: modified z-scores from the
    median and the median absolute deviation (Iglewicz & Hoaglin 1993,
    public method — 0.6745·|v−med|/MAD, flag > 3.5). Unlike the rolling
    z-score (mean/stddev) detector, the breakdown point is 50% — a burst
    of extreme values cannot drag the threshold. Two grouped exact-median
    passes with the per-group constants BROADCAST back (group count is
    bounded); at 100 TB the exact medians swap for percentile_approx
    exactly as documented in agg_exact_percentiles."""
    ev = Catalog(spark, sf_dir).events
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", "med",
                   F.abs(F.col("value") - F.col("med")).alias("adev")))
    mads = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"))
    scored = (
        dev.join(F.broadcast(mads), "event_type")
        .select("event_type", "med", "mad",
                F.when(F.col("mad") > 0,
                       F.round(F.lit(0.6745) * F.col("adev")
                               / F.col("mad"), 6)).alias("mod_z"))
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("mod_z") > 3.5, 1).otherwise(0)).cast("bigint")
        .alias("n_outliers"),
        F.round(F.min("med"), 4).alias("med"),
        F.round(F.min("mad"), 4).alias("mad"),
        F.round(F.max("mod_z"), 6).alias("max_mod_z"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint over binned event time
# ---------------------------------------------------------------------------


@query(
    "drift_cusum_changepoint",
    """
    WITH ev AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(epoch_us(ts) AS BIGINT) AS t
        FROM events
    ),
    stats AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS total,
               min(t) AS tmin, max(t) AS tmax
        FROM ev GROUP BY event_type
    ),
    per_bin AS (
        SELECT e.event_type,
               least(255, ((e.t - s.tmin) * 256) // (s.tmax - s.tmin + 1))
                   AS bin,
               CAST(sum(e.cents) AS BIGINT) AS bin_cents,
               CAST(count(*) AS BIGINT) AS bin_n
        FROM ev e JOIN stats s USING (event_type)
        GROUP BY 1, 2
    ),
    dev AS (
        SELECT p.event_type, p.bin,
               p.bin_cents
               - CAST(round(p.bin_n * (s.total / s.n)) AS BIGINT) AS d
        FROM per_bin p JOIN stats s USING (event_type)
    ),
    cusum AS (
        SELECT event_type, bin,
               CAST(sum(d) OVER (PARTITION BY event_type ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
        FROM dev
    ),
    ranked AS (
        SELECT event_type, bin, s,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(s) DESC, bin ASC) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_bins
        FROM cusum
    )
    SELECT event_type, n_bins, CAST(bin AS BIGINT) AS cp_bin,
           round(s / 100.0, 2) AS max_cusum_dev
    FROM ranked WHERE rn = 1
    """,
)
def drift_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint localization per event type (Page 1954, public
    method): cumulative sum of per-bin deviations from the type's mean
    value over 256 equi-width time bins; the bin where |S| peaks is the
    most likely mean-shift point. All arithmetic is exact-integer cents —
    the deviation is bin_cents − round(expected), the cumulative sum is a
    bigint running total — so no float-summation order can flip the
    answer. The KS-drift treatment applied to changepoint LOCALIZATION:
    cumulative windows run over ≤256 bin rows per type (bounded), bin
    aggregation partial-collapses map-side, per-type stats broadcast."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_micros("ts").alias("t"))
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
        F.min("t").alias("tmin"), F.max("t").alias("tmax"))
    binned = (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("bin", F.least(
            F.lit(255),
            F.expr("((t - tmin) * 256) div (tmax - tmin + 1)")))
        .groupBy("event_type", "bin")
        .agg(F.sum("cents").cast("bigint").alias("bin_cents"),
             F.count(F.lit(1)).alias("bin_n"))
    )
    dev = (
        binned.join(F.broadcast(stats), "event_type")
        .select("event_type", "bin",
                (F.col("bin_cents")
                 - F.round(F.col("bin_n") * (F.col("total") / F.col("n")))
                 .cast("bigint")).alias("d"))
    )
    w = (Window.partitionBy("event_type").orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cusum = dev.select(
        "event_type", "bin",
        F.sum("d").over(w).cast("bigint").alias("s"))
    return (
        cusum.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_bins"),
             F.max_by(F.struct(F.col("bin"), F.col("s")),
                      F.struct(F.abs("s"), -F.col("bin"))).alias("_cp"))
        .select("event_type", "n_bins",
                F.col("_cp.bin").cast("bigint").alias("cp_bin"),
                F.round(F.col("_cp.s") / 100.0, 2).alias("max_cusum_dev"))
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation vs truth (CBO statistics quality)
# ---------------------------------------------------------------------------


@query(
    "join_cardinality_estimate",
    """
    WITH a AS (
        SELECT o_orderkey % 64 AS b, o_orderkey AS k FROM orders
    ),
    bt AS (
        SELECT l_orderkey % 64 AS b, l_orderkey AS k FROM lineitem
    ),
    astats AS (
        SELECT b, CAST(count(*) AS BIGINT) AS na,
               CAST(count(DISTINCT k) AS BIGINT) AS da
        FROM a GROUP BY b
    ),
    bstats AS (
        SELECT b, CAST(count(*) AS BIGINT) AS nb,
               CAST(count(DISTINCT k) AS BIGINT) AS db
        FROM bt GROUP BY b
    ),
    ka AS (SELECT b, k, count(*) AS ca FROM a GROUP BY b, k),
    kb AS (SELECT b, k, count(*) AS cb FROM bt GROUP BY b, k),
    actual AS (
        SELECT ka.b, CAST(sum(ka.ca * kb.cb) AS BIGINT) AS actual_rows
        FROM ka JOIN kb ON ka.b = kb.b AND ka.k = kb.k
        GROUP BY ka.b
    )
    SELECT s.b AS bucket, s.na, s.da, t.nb, t.db,
           round(s.na * t.nb / greatest(s.da, t.db), 2) AS est_rows,
           coalesce(x.actual_rows, 0) AS actual_rows,
           CASE WHEN coalesce(x.actual_rows, 0) > 0
                THEN round((s.na * t.nb / greatest(s.da, t.db)
                            - x.actual_rows) / x.actual_rows, 4) END
               AS rel_err
    FROM astats s
    JOIN bstats t ON s.b = t.b
    LEFT JOIN actual x ON s.b = x.b
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket equi-join cardinality estimation — the CBO statistic the
    optimizer's join ordering lives on — against ground truth computed
    WITHOUT materializing the join: estimate = nₐ·n_b / max(dₐ, d_b) (the
    textbook containment assumption, Selinger 1979); truth = Σ_key
    cnt_a·cnt_b from the two per-key count tables joined on the key (the
    join's size, from statistics-sized inputs). 64 key-range buckets make
    the per-bucket error profile visible — exactly what a histogram-backed
    CBO consumes. Everything is integer counts plus one division, both
    engines identical."""
    cat = Catalog(spark, sf_dir)
    a = cat.orders.select((F.col("o_orderkey") % 64).alias("b"),
                          F.col("o_orderkey").alias("k"))
    bt = cat.lineitem.select((F.col("l_orderkey") % 64).alias("b"),
                             F.col("l_orderkey").alias("k"))
    astats = a.groupBy("b").agg(
        F.count(F.lit(1)).alias("na"),
        F.countDistinct("k").alias("da"))
    bstats = bt.groupBy("b").agg(
        F.count(F.lit(1)).alias("nb"),
        F.countDistinct("k").alias("db"))
    ka = a.groupBy("b", "k").agg(F.count(F.lit(1)).alias("ca"))
    kb = bt.groupBy("b", "k").agg(F.count(F.lit(1)).alias("cb"))
    actual = (ka.join(kb, ["b", "k"])
              .groupBy("b")
              .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint")
                   .alias("actual_rows")))
    est = F.col("na") * F.col("nb") / F.greatest("da", "db")
    act = F.coalesce(F.col("actual_rows"), F.lit(0).cast("bigint"))
    return (
        astats.join(bstats, "b")
        .join(actual, "b", "left")
        .select(F.col("b").alias("bucket"), "na", "da", "nb", "db",
                F.round(est, 2).alias("est_rows"),
                act.alias("actual_rows"),
                F.when(act > 0, F.round((est - F.col("actual_rows"))
                                        / F.col("actual_rows"), 4))
                .alias("rel_err"))
    )


@query(
    "assoc_frequent_triples",
    """
    WITH baskets AS (
        -- composite basket key: with (user_id, day) as two join columns
        -- DuckDB planned the a.item < b.item residual as a PIECEWISE
        -- MERGE JOIN (an 80k x 80k inequality merge at sf0.1); one
        -- equality key forces the hash-join path and the residual stays
        -- a filter.
        SELECT DISTINCT CAST(user_id AS VARCHAR) || '#'
               || CAST(CAST(ts AS DATE) AS VARCHAR) AS bid,
               event_type AS item
        FROM events
    ),
    freq AS (
        SELECT item FROM baskets GROUP BY item HAVING count(*) >= 20
    ),
    fb AS (SELECT b.* FROM baskets b JOIN freq USING (item)),
    fsets AS (SELECT DISTINCT bid FROM fb),
    tri AS (
        SELECT a.item AS a, b.item AS b, c.item AS c,
               CAST(count(*) AS BIGINT) AS n_baskets
        FROM fb a
        JOIN fb b ON a.bid = b.bid AND a.item < b.item
        JOIN fb c ON b.bid = c.bid AND b.item < c.item
        GROUP BY 1, 2, 3
        HAVING count(*) >= 2
    )
    SELECT a, b, c, n_baskets,
           round(n_baskets
                 / (SELECT CAST(count(*) AS BIGINT) FROM fsets), 6)
               AS support
    FROM tri
    """,
)
def assoc_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type 3-itemsets over daily (user, day) baskets —
    Apriori level 3 (operators/assoc.py:frequent_triples): item-support
    pruning (broadcast), then basket-local 3-combination generation by
    nested transform/slice lambdas INSIDE the project (no basket
    self-join — the oracle's 3-way join is the independent check), one
    hash count, support floor 2."""
    from hierarchical_graph_db_spark.operators.assoc import frequent_triples

    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day"), "event_type")
    return frequent_triples(ev, ["user_id", "day"], "event_type",
                            min_item_count=20, min_triple_count=2)


@query(
    "user_activity_entropy",
    """
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    ),
    t AS (
        SELECT user_id, CAST(sum(n) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS n_types
        FROM c GROUP BY user_id
    )
    SELECT c.user_id, t.n_types, t.tot,
           round(-sum((c.n / CAST(t.tot AS DOUBLE))
                      * ln(c.n / CAST(t.tot AS DOUBLE))), 6) AS entropy
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id, t.n_types, t.tot
    """,
)
def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral
    diversity score (0 = single-minded, ln(5) ≈ 1.609 = uniform over the
    five types): the segmentation feature between raw counts and the full
    transition matrix. Counts are exact integers; the ≤5-term entropy
    fold divides and logs once per term (the PSI ln-parity precedent),
    rounded at 6dp. Two map-side-collapsing aggregates, join keyed on the
    user."""
    ev = Catalog(spark, sf_dir).events
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("tot"),
        F.count(F.lit(1)).alias("n_types"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "n_types", "tot")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )


@query(
    "order_value_gini",
    """
    WITH o AS (
        SELECT c.c_mktsegment AS segment,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders JOIN customer c ON o_custkey = c_custkey
    ),
    ranked AS (
        SELECT segment, cents,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY cents, o_orderkey) AS rk
        FROM o
    ),
    sums AS (
        SELECT segment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(rk * cents) AS BIGINT) AS ws
        FROM ranked GROUP BY segment
    )
    SELECT segment, n,
           round(s / 100.0, 2) AS total_value,
           round(2.0 * ws / (n * CAST(s AS DOUBLE))
                 - (n + 1) / CAST(n AS DOUBLE), 6) AS gini
    FROM sums
    """,
)
def order_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order values per customer segment — revenue
    concentration (0 = equal orders, → 1 = one whale), by the rank
    formula G = 2·Σ rᵢxᵢ / (n·Σxᵢ) − (n+1)/n. Every sum is an exact
    integer (cents × ranks — bigint-safe to ~10⁹ orders per segment at
    max price), so the whole statistic is two divisions at the end; ranks
    tie-break on the order key, and the rank window runs per segment."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    o = (cat.orders.join(
        F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
        cat.orders.o_custkey == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("segment"),
                F.round(F.col("o_totalprice") * 100).cast("bigint")
                .alias("cents"), "o_orderkey"))
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    ranked = o.withColumn("rk", F.row_number().over(w))
    sums = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("ws"))
    return sums.select(
        "segment", "n",
        F.round(F.col("s") / 100.0, 2).alias("total_value"),
        F.round(F.lit(2.0) * F.col("ws")
                / (F.col("n") * F.col("s").cast("double"))
                - (F.col("n") + 1) / F.col("n").cast("double"), 6)
        .alias("gini"),
    )
