"""Learned quality-classifier queries: in-engine gradient-descent training
of a linear scorer (operators/lr.py) with a fully unrolled SQL oracle.

The oracle replays EVERYTHING: 6dp feature quantization, fixed-point
moment sums, z-score standardization, class weights, and all GD rounds —
each round a CTE computing the 4 fixed-point gradient cells from the
previous round's weights (carried as 1-row cross-joined tables where the
Spark plan uses driver literals). The fast-sigmoid link keeps every step
in exact IEEE arithmetic, so the replay is bit-for-bit. Oracle text is
GENERATED from the same LR_RATE / LR_ROUNDS constants the operator uses.

Every 6dp quantization is ``floor(x * 1000000.0 + 0.5) / 1000000.0`` —
pure IEEE ops, matching operators/lr.py exactly — NOT ``round(x, 6)``,
because DuckDB rounds the binary double while Spark rounds HALF_UP over
the shortest decimal repr and the two disagree on terminating decimals
ending in 5 (see the operators/lr.py module docstring for the observed
sf1 case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.lr import (
    LR_RATE,
    LR_ROUNDS,
    lr_scores,
    lr_weight_table,
)
from hierarchical_graph_db_spark.queries import query

# The feature/label expressions are imported from textq so the classifier
# can never drift from the quality-metric and keep-rule contracts.
from hierarchical_graph_db_spark.queries.textq import (  # noqa: E402
    _QF_RULES_SQL,
    _SQL_HITS,
    _SQL_TOKENS,
)

#: floor-based 6dp quantization (see module docstring) as an SQL template.
def _q6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


#: fixed-point BIGINT sum cell — floor(x*1e6 + 0.5), matching lr._cell.
def _qcell(expr: str) -> str:
    return f"CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)"


_F1_EXPR = f"{_SQL_HITS} / len({_SQL_TOKENS})"
_F2_EXPR = ("length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
            " / length(text)")
_F3_EXPR = ("length(regexp_replace(text, '\\s+', '', 'g'))"
            f" / len({_SQL_TOKENS}) / 10")

_RAW_CTE = f"""
    raw AS (
        SELECT doc_id,
               {_q6(_F1_EXPR)} AS f1,
               {_q6(_F2_EXPR)} AS f2,
               {_q6(_F3_EXPR)} AS f3,
               CASE WHEN {_QF_RULES_SQL} THEN 1.0 ELSE 0.0 END AS y
        FROM documents
        WHERE length(trim(text)) > 0
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS npos,
               CAST(sum({_qcell("f1")}) AS BIGINT) AS s1,
               CAST(sum({_qcell("f2")}) AS BIGINT) AS s2,
               CAST(sum({_qcell("f3")}) AS BIGINT) AS s3,
               CAST(sum({_qcell("f1 * f1")}) AS BIGINT) AS q1,
               CAST(sum({_qcell("f2 * f2")}) AS BIGINT) AS q2,
               CAST(sum({_qcell("f3 * f3")}) AS BIGINT) AS q3
        FROM raw
    ),
    mu AS (
        SELECT n,
               {_q6("n / (2.0 * npos)")} AS cpos,
               {_q6("n / (2.0 * (n - npos))")} AS cneg,
               {_q6("(s1 / 1000000.0) / n")} AS mu1,
               {_q6("(s2 / 1000000.0) / n")} AS mu2,
               {_q6("(s3 / 1000000.0) / n")} AS mu3,
               (q1 / 1000000.0) / n AS m21,
               (q2 / 1000000.0) / n AS m22,
               (q3 / 1000000.0) / n AS m23
        FROM st
    ),
    norm AS (
        SELECT n, cpos, cneg, mu1, mu2, mu3,
               {_q6("sqrt(greatest(m21 - mu1 * mu1, 0.000000000001))")}
               AS sd1,
               {_q6("sqrt(greatest(m22 - mu2 * mu2, 0.000000000001))")}
               AS sd2,
               {_q6("sqrt(greatest(m23 - mu3 * mu3, 0.000000000001))")}
               AS sd3
        FROM mu
    ),
    feats AS MATERIALIZED (
        SELECT r.doc_id, r.y,
               CASE WHEN r.y = 1.0 THEN m.cpos ELSE m.cneg END AS c,
               {_q6("(r.f1 - m.mu1) / m.sd1")} AS f1,
               {_q6("(r.f2 - m.mu2) / m.sd2")} AS f2,
               {_q6("(r.f3 - m.mu3) / m.sd3")} AS f3,
               m.n AS n
        FROM raw r CROSS JOIN norm m
    ),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)
"""


def _round_ctes(r: int) -> str:
    return f"""
    g{r} AS MATERIALIZED (
        SELECT CAST(sum({_qcell("c * (p - y)")}) AS BIGINT) AS s0,
               CAST(sum({_qcell("c * (p - y) * f1")}) AS BIGINT) AS s1,
               CAST(sum({_qcell("c * (p - y) * f2")}) AS BIGINT) AS s2,
               CAST(sum({_qcell("c * (p - y) * f3")}) AS BIGINT) AS s3,
               max(n) AS n
        FROM (
            SELECT t.*, 0.5 + z / (2.0 * (1.0 + abs(z))) AS p
            FROM (
                SELECT f.*,
                       w.b + w.w1 * f.f1 + w.w2 * f.f2 + w.w3 * f.f3 AS z
                FROM feats f CROSS JOIN w{r - 1} w
            ) t
        ) s
    ),
    w{r} AS MATERIALIZED (
        SELECT {_q6(f"w.b - {LR_RATE} * ((g.s0 / 1000000.0) / g.n)")} AS b,
               {_q6(f"w.w1 - {LR_RATE} * ((g.s1 / 1000000.0) / g.n)")} AS w1,
               {_q6(f"w.w2 - {LR_RATE} * ((g.s2 / 1000000.0) / g.n)")} AS w2,
               {_q6(f"w.w3 - {LR_RATE} * ((g.s3 / 1000000.0) / g.n)")} AS w3
        FROM w{r - 1} w CROSS JOIN g{r} g
    )"""


_TRAIN_CHAIN = ("WITH " + _RAW_CTE + ","
                + ",".join(_round_ctes(r) for r in range(1, LR_ROUNDS + 1)))

_WF = f"w{LR_ROUNDS}"

_WEIGHTS_SQL = _TRAIN_CHAIN + f"""
    SELECT 'bias' AS feature, b AS weight FROM {_WF}
    UNION ALL SELECT 'stopword_ratio', w1 FROM {_WF}
    UNION ALL SELECT 'alpha_ratio', w2 FROM {_WF}
    UNION ALL SELECT 'mean_token_len', w3 FROM {_WF}
"""

_SCORES_SQL = _TRAIN_CHAIN + f"""
    SELECT t.doc_id,
           {_q6("0.5 + z / (2.0 * (1.0 + abs(z)))")} AS score,
           {_q6("0.5 + z / (2.0 * (1.0 + abs(z)))")} >= 0.5 AS predicted,
           CAST(t.y AS INTEGER) AS label
    FROM (
        SELECT f.doc_id, f.y,
               w.b + w.w1 * f.f1 + w.w2 * f.f2 + w.w3 * f.f3 AS z
        FROM feats f CROSS JOIN {_WF} w
    ) t
"""


@query("quality_lr_weights", _WEIGHTS_SQL)
def quality_lr_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the learned quality scorer (GD distillation of the C4-style
    keep rule into a smooth linear score; class-balanced, standardized
    features) and return the 4 weights. Per round: one 4-cell fixed-point
    gradient aggregate — see ``operators/lr.py`` for the 100 TB shape."""
    return lr_weight_table(Catalog(spark, sf_dir).documents)


@query("quality_lr_scores", _SCORES_SQL)
def quality_lr_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document smooth quality score + keep prediction from the trained
    scorer — the scoring pass is a pure projection (weights and
    normalization constants are plan literals)."""
    return lr_scores(Catalog(spark, sf_dir).documents)
