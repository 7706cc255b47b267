"""Quantiles + cardinality sketches over the fixtures.

Exact percentiles are cross-engine checkable (Spark ``percentile`` and
DuckDB ``quantile_cont`` both do linear interpolation). HLL
(``approx_count_distinct``) is a sketch whose exact output is
engine-specific, so it gets a rows-only driver check plus a pytest accuracy
bound against the exact count — the right correctness statement for a
sketch: bounded error, not byte equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query


@query(
    "agg_exact_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag. At 100 TB exact
    percentiles need a full sort per group — the production swap is
    percentile_approx (t-digest) at fixed error; the exact form is the
    correctness baseline, same relationship as brute-force vs LSH in the
    ANN family."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@query("agg_hll_distinct", None)  # sketch: engine-specific bits → rows-only;
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event_type (rsd 2%). Error bound vs
    the exact count is asserted in tests/test_sketches.py — sketches are
    graded on bounded error, not byte equality."""
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


def _sql_cms_col(r_expr: str, item_expr: str, width: int) -> str:
    """DuckDB twin of operators.sketches._cell: first 4 sha256 nibbles of
    'cms-v1|r|item' as an int, mod width."""
    from hierarchical_graph_db_spark.queries.trainingq import _sql_u16

    hx = (f"sha256('cms-v1|' || CAST({r_expr} AS VARCHAR) || '|' "
          f"|| {item_expr})")
    return f"({_sql_u16(hx)} % {width})"


_CMS_W, _CMS_D = 64, 4


@query(
    "sketch_cms_token_counts",
    f"""
    WITH tok AS (
        SELECT lower(unnest(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
    cells AS (
        SELECT r, {_sql_cms_col('r', 'token', _CMS_W)} AS col,
               count(*) AS c
        FROM tok CROSS JOIN rs GROUP BY 1, 2
    ),
    probe AS (SELECT DISTINCT token FROM tok),
    pc AS (
        SELECT p.token, rs.r, {_sql_cms_col('rs.r', 'p.token', _CMS_W)} AS col
        FROM probe p CROSS JOIN rs
    ),
    est AS (
        SELECT pc.token, min(cells.c) AS est_n
        FROM pc JOIN cells ON cells.r = pc.r AND cells.col = pc.col
        GROUP BY pc.token
    ),
    truth AS (SELECT token, count(*) AS true_n FROM tok GROUP BY token)
    SELECT truth.token, CAST(true_n AS BIGINT) AS true_n,
           CAST(est_n AS BIGINT) AS est_n
    FROM truth JOIN est ON truth.token = est.token
    """,
)
def sketch_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over the corpus token stream
    (64 columns × 4 rows), probed with every distinct token and laid beside
    the exact counts. Because the hash family is portable salted-sha256,
    the DuckDB oracle replays the ENTIRE sketch grid — a sketch whose
    estimates are hash-checked cell-for-cell, not just error-bounded
    (``est_n ≥ true_n`` always; the pytest bound covers the inflation)."""
    from hierarchical_graph_db_spark.functions.text import tokens
    from hierarchical_graph_db_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    docs = Catalog(spark, sf_dir).documents \
        .where(F.length(F.trim("text")) > 0)
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("_raw")) \
        .select(F.lower("_raw").alias("token"))
    sketch = cms_build(tok, "token", width=_CMS_W, depth=_CMS_D)
    truth = tok.groupBy("token").agg(F.count(F.lit(1)).alias("true_n"))
    # probes come off the truth aggregate — no second tokenize/distinct pass
    est = cms_estimate(sketch, truth.select("token"), "token",
                       width=_CMS_W, depth=_CMS_D)
    return (
        truth.join(est, truth.token == est.item)
        .select("token", "true_n", F.col("est_n").cast("long").alias("est_n"))
    )


def _sql_hex15(hex_expr: str) -> str:
    """First 15 sha256 nibbles as a 60-bit BIGINT (DuckDB twin of
    operators.sketches.hll_distinct's conv(substr(hex,1,15),16,10))."""
    terms = [
        f"(strpos('0123456789abcdef', substr({hex_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def _sql_hll(m: int, merge_daily: bool = False) -> str:
    """DuckDB twin of operators.sketches.hll_distinct at ``m`` registers:
    every register max replayed, exact integer Σ 2^(r1-M_j), and the
    alpha·m²·2^r1 numerator computed ONCE in Python so both engines see the
    identical double literal (one division, no order-dependent float
    folds). With ``merge_daily`` the registers are first built per
    (day, event_type) and then max-merged — the sketch-partial rollup path
    of operators.sketches.hll_merge, replayed level by level."""
    from hierarchical_graph_db_spark.operators.sketches import hll_alpha

    p = m.bit_length() - 1
    r1 = 60 - p + 1
    numerator = repr(hll_alpha(m) * m * m * float(1 << r1))
    s_total = (f"CAST(s_present + ({m} - n_present) * "
               f"(1::BIGINT << {r1}) AS DOUBLE)")
    if merge_daily:
        reg_ctes = f"""keys AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, event_type, user_id
        FROM events
    ),
    h AS (
        SELECT day, event_type,
               {_sql_hex15("sha256('hll-v1|' || CAST(user_id AS VARCHAR))")}
                   AS hv
        FROM keys
    ),
    dregs AS (
        SELECT day, event_type, hv % {m} AS reg,
               max(CASE WHEN (hv >> {p}) = 0 THEN {r1}
                        ELSE {r1} - length(to_base(hv >> {p}, 2)) END) AS m_j
        FROM h GROUP BY 1, 2, 3
    ),
    regs AS (
        SELECT event_type, reg, max(m_j) AS m_j FROM dregs GROUP BY 1, 2
    )"""
    else:
        reg_ctes = f"""keys AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    h AS (
        SELECT event_type,
               {_sql_hex15("sha256('hll-v1|' || CAST(user_id AS VARCHAR))")}
                   AS hv
        FROM keys
    ),
    regs AS (
        SELECT event_type, hv % {m} AS reg,
               max(CASE WHEN (hv >> {p}) = 0 THEN {r1}
                        ELSE {r1} - length(to_base(hv >> {p}, 2)) END) AS m_j
        FROM h GROUP BY 1, 2
    )"""
    return f"""
    WITH {reg_ctes},
    per AS (
        SELECT event_type, count(*) AS n_present,
               sum(1::BIGINT << ({r1} - m_j)) AS s_present
        FROM regs GROUP BY 1
    )
    SELECT event_type,
           round(CASE WHEN {numerator} / {s_total} <= {2.5 * m}
                       AND n_present < {m}
                      THEN {float(m)} * ln({float(m)} / ({m} - n_present))
                      ELSE {numerator} / {s_total}
                 END, 4) AS est_users
    FROM per
    """


@query("sketch_hll_distinct", _sql_hll(1024))
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct users per event_type (m=1024, rsd
    3.25% — comparable to ``approx_count_distinct`` at rsd 2%) — every
    register replayed by the DuckDB oracle (sha256 hash family, exact
    integer register sum), so the CARDINALITY SKETCH itself is
    hash-checked, not just error-bounded, and accurate enough to BE the
    production form. ``agg_hll_distinct`` keeps the engine-native
    ``approx_count_distinct`` beside it as the rows-only alternative;
    accuracy vs exact counts is bounded in tests/test_sketches.py."""
    from hierarchical_graph_db_spark.operators.sketches import hll_distinct

    ev = Catalog(spark, sf_dir).events
    return hll_distinct(ev, "user_id", ["event_type"], m=1024)


@query("sketch_hll_mergeable_rollup", _sql_hll(1024, merge_daily=True))
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type computed by MERGING per-day HLL
    register partials (max per register) instead of touching raw rows —
    the pre-aggregation pattern that makes sketches the 100 TB answer:
    persist fine-grained register tables (≤ m rows per group per day),
    roll any coarser window up from them. The oracle replays both levels
    (daily registers, then the max-merge), and the merged estimate is
    bit-identical to the direct computation (pinned in
    tests/test_sketches.py) because register max is associative."""
    from hierarchical_graph_db_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = Catalog(spark, sf_dir).events.withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd"))
    daily = hll_registers(ev, "user_id", ["day", "event_type"], m=1024)
    merged = hll_merge(daily, ["event_type"])
    return hll_estimate(merged, ["event_type"], m=1024)


def _sql_sample_quantiles() -> str:
    from hierarchical_graph_db_spark.queries.trainingq import _sql_u16

    return f"""
    WITH h AS (
        SELECT event_type, value,
               sha256('squant|' || CAST(event_id AS VARCHAR)) AS hx
        FROM events
    ),
    s AS (
        SELECT event_type, value FROM h
        WHERE {_sql_u16("hx")} < {int(0.25 * 65536)}
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_sample,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM s GROUP BY event_type
    """


@query("sketch_sample_quantiles", _sql_sample_quantiles())
def sketch_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value quantiles off a deterministic 25% hash sample
    (operators/sketches.py:sample_quantiles): the sample predicate is a
    pure projection of event_id (evaluates inside the scan — no shuffle,
    no sketch state), the per-group sort shrinks by the rate, and because
    the sample is the salted-u16 contract rather than rand(), the DuckDB
    oracle replays the membership decision nibble-for-nibble and the
    estimate is hash-checked — the sample-based counterpart to
    ``agg_exact_percentiles`` the way ``sketch_hll_distinct`` pairs with
    ``agg_hll_distinct``. Rank-error vs the full-data quantiles is bounded
    in tests/test_sketches.py."""
    from hierarchical_graph_db_spark.operators.sketches import (
        sample_quantiles,
    )

    ev = Catalog(spark, sf_dir).events
    return sample_quantiles(ev, "value", ["event_type"], key_col="event_id",
                            rate=0.25)


def _sql_hll_setops(m: int = 1024) -> str:
    """Union + inclusion-exclusion intersection over HLL register tables,
    replayed register-for-register (the union of two HLLs is the per-
    register max — exact, not approximate; only the intersection inherits
    I-E's error)."""
    from hierarchical_graph_db_spark.operators.sketches import hll_alpha

    p = m.bit_length() - 1
    r1 = 60 - p + 1
    numerator = repr(hll_alpha(m) * m * m * float(1 << r1))

    def est(src: str) -> str:
        tot = (f"CAST(s_present + ({m} - n_present) * "
               f"(1::BIGINT << {r1}) AS DOUBLE)")
        return f"""(
        SELECT round(CASE WHEN {numerator} / {tot} <= {2.5 * m}
                           AND n_present < {m}
                          THEN {float(m)} * ln({float(m)} / ({m} - n_present))
                          ELSE {numerator} / {tot}
                     END, 4)
        FROM (SELECT count(*) AS n_present,
                     sum(1::BIGINT << ({r1} - m_j)) AS s_present
              FROM {src})
    )"""

    regs = f"""
    WITH keys AS (
        SELECT DISTINCT event_type, user_id FROM events
        WHERE event_type IN ('view', 'purchase')
    ),
    h AS (
        SELECT event_type,
               {_sql_hex15("sha256('hll-v1|' || CAST(user_id AS VARCHAR))")}
                   AS hv
        FROM keys
    ),
    regs AS (
        SELECT event_type, hv % {m} AS reg,
               max(CASE WHEN (hv >> {p}) = 0 THEN {r1}
                        ELSE {r1} - length(to_base(hv >> {p}, 2)) END) AS m_j
        FROM h GROUP BY 1, 2
    ),
    ra AS (SELECT reg, m_j FROM regs WHERE event_type = 'view'),
    rb AS (SELECT reg, m_j FROM regs WHERE event_type = 'purchase'),
    ru AS (SELECT reg, max(m_j) AS m_j FROM regs GROUP BY reg)
    """
    return regs + f"""
    SELECT {est('ra')} AS est_view,
           {est('rb')} AS est_purchase,
           {est('ru')} AS est_union,
           round({est('ra')} + {est('rb')} - {est('ru')}, 4)
               AS est_intersection
    """


@query("sketch_hll_set_operations", _sql_hll_setops(1024))
def sketch_hll_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on cardinality sketches: distinct viewers, distinct
    purchasers, their UNION (per-register max — exact sketch union, the
    property that lets register tables stand in for key sets at 100 TB),
    and the inclusion-exclusion INTERSECTION estimate (|A∩B| ≈
    |A|+|B|−|A∪B| — the standard HLL intersection, error grows as the
    intersection shrinks; Theta sketches are the public upgrade when
    intersections dominate). Every register of all three sketches is
    replayed by the oracle; accuracy vs exact counts is bounded in
    tests/test_sketches.py."""
    from hierarchical_graph_db_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = Catalog(spark, sf_dir).events \
        .where(F.col("event_type").isin("view", "purchase"))
    regs = hll_registers(ev, "user_id", ["event_type"], m=1024)
    per = hll_estimate(regs, ["event_type"], m=1024)
    est_a = per.where(F.col("event_type") == "view") \
        .select(F.col("est_users").alias("est_view"))
    est_b = per.where(F.col("event_type") == "purchase") \
        .select(F.col("est_users").alias("est_purchase"))
    est_u = hll_estimate(hll_merge(regs, []), [], m=1024) \
        .select(F.col("est_users").alias("est_union"))
    return (
        est_a.crossJoin(F.broadcast(est_b)).crossJoin(F.broadcast(est_u))
        .select(
            "est_view", "est_purchase", "est_union",
            F.round(F.col("est_view") + F.col("est_purchase")
                    - F.col("est_union"), 4).alias("est_intersection"),
        )
    )


@query(
    "neyman_allocation_plan",
    """
    WITH mom AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s1,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s2
        FROM events GROUP BY event_type
    ),
    sd AS (
        SELECT event_type, n,
               sqrt((n * s2 - s1 * s1)
                    / CAST(n AS DOUBLE) / (n - 1)) / 100.0 AS sigma
        FROM mom WHERE n >= 2
    ),
    w AS (
        SELECT event_type, n, sigma,
               CAST(round(n * sigma * 1000000) AS BIGINT) AS wq
        FROM sd
    )
    SELECT event_type, n AS stratum_size, round(sigma, 4) AS sigma,
           round(wq / CAST((SELECT sum(wq) FROM w) AS DOUBLE), 6)
               AS alloc_share,
           CAST(round(1000 * wq
                      / CAST((SELECT sum(wq) FROM w) AS DOUBLE))
                AS BIGINT) AS alloc_n
    FROM w
    """,
)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified-sampling allocation (Neyman 1934, public
    method): sample budget shares nᵢ ∝ Nᵢ·σᵢ per event-type stratum —
    minimum-variance allocation for estimating the mean, the planning
    table the hash-based stratified sampler consumes. Stddev comes from
    exact integer cent moments (n·Σx² − (Σx)² — one pass, map-side
    partials), the weight Nᵢσᵢ is 1e-6-quantized before the share
    normalization (exact integer denominator, the temperature-mixture
    treatment)."""
    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"))
    mom = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"))
    sd = mom.where(F.col("n") >= 2).select(
        "event_type", "n",
        (F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
                / F.col("n").cast("double") / (F.col("n") - 1))
         / 100.0).alias("sigma"))
    w = sd.withColumn(
        "wq", F.round(F.col("n") * F.col("sigma") * 1000000).cast("bigint"))
    tot = w.agg(F.sum("wq").alias("t"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select("event_type", F.col("n").alias("stratum_size"),
                F.round("sigma", 4).alias("sigma"),
                F.round(F.col("wq") / F.col("t").cast("double"), 6)
                .alias("alloc_share"),
                F.round(F.lit(1000) * F.col("wq")
                        / F.col("t").cast("double")).cast("bigint")
                .alias("alloc_n"))
    )


@query(
    "embedding_constraint_suite",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_vec,
           CAST(sum(CASE WHEN embedding IS NOT NULL
                          AND len(embedding) <> 64 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_wrong_dim,
           CAST(sum(CASE WHEN embedding IS NOT NULL AND len(list_filter(
                    embedding, x -> isnan(CAST(x AS DOUBLE))
                                    OR isinf(CAST(x AS DOUBLE)))) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
           CAST(count(DISTINCT vec_id) AS BIGINT) AS n_distinct_ids,
           CAST(min(label) AS BIGINT) AS label_min,
           CAST(max(label) AS BIGINT) AS label_max
    FROM embeddings
    """,
)
def embedding_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite for the EMBEDDING table — the vector
    columns need their own contract beside the relational checks: null
    vectors, dimension drift (≠64), non-finite components (NaN/Inf kill
    every downstream distance silently), id uniqueness, label domain.
    ONE conditional aggregation pass; the component scan is an exists-style
    higher-order filter inside the project, no explode."""
    emb = Catalog(spark, sf_dir).embeddings
    v = F.col("embedding")
    nonfinite = F.exists(
        v, lambda x: F.isnan(x.cast("double"))
        | (x.cast("double") == float("inf"))
        | (x.cast("double") == float("-inf")))
    return emb.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("bigint")
        .alias("n_null_vec"),
        F.sum(F.when(v.isNotNull() & (F.size(v) != 64), 1).otherwise(0))
        .cast("bigint").alias("n_wrong_dim"),
        F.sum(F.when(v.isNotNull() & nonfinite, 1).otherwise(0))
        .cast("bigint").alias("n_nonfinite"),
        F.countDistinct("vec_id").alias("n_distinct_ids"),
        F.min("label").cast("bigint").alias("label_min"),
        F.max("label").cast("bigint").alias("label_max"),
    )
