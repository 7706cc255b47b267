"""Distributed linear-classifier training by full-batch gradient descent —
an in-engine learned quality scorer for curation pipelines.

Production corpora are filtered by LEARNED quality classifiers (the
fastText / logistic-regression scorers of GPT-3's and CCNet's pipelines —
Brown et al. 2020 §A, Wenzek et al. 2020), usually trained by distilling a
rule or a reference corpus into a smooth score. This operator trains that
scorer INSIDE the engine: the C4-style ``quality_keep`` rule provides the
labels and gradient descent distills it into a calibrated linear score
over the engine's own quality features. The reference has nothing of the
kind (SURVEY.md §2.11 north-star scope); this is the supervised sibling of
``operators/clustering.py``'s k-means.

Scale shape (per GD round, like a Lloyd round):

* ONE aggregate over the feature table whose per-row gradient
  contributions quantize to 1e-6 and sum as bigints — partials collapse
  map-side, the exchange carries 4 cells, and integer addition makes the
  gradient partitioning-independent (f, |c·r| ≤ ~4 ⇒ |cell| ≤ 4e6/row:
  1e12 rows stays well inside int64);
* a 4-number collect + driver weight update — weights re-enter the next
  round's plan as literals (no lineage growth).

Determinism / oracle parity: the link is the "fast sigmoid"
``σ(z) = 0.5 + z / (2·(1+|z|))`` — pure IEEE-754 arithmetic (add, mul,
div, abs), so Spark, Python, and SQL produce bit-identical probabilities;
a transcendental ``exp`` would differ across libm implementations in the
last ulp and could flip a 6dp rounding. For the same reason EVERY 6dp
quantization in this family is ``floor(x·1e6 + 0.5) / 1e6`` — pure IEEE
mul/add/floor, bit-identical across engines — never the engines' decimal
``round``: Spark rounds HALF_UP over the shortest decimal repr while
DuckDB rounds the binary double, and the two disagree whenever a value
prints as an exact decimal ``…5`` at the 7th place. Integer-ratio
features hit such terminating decimals routinely (e.g. chars/tokens/10 =
323/640 = 0.5046875 → Spark 0.504688, DuckDB 0.504687 — observed at
sf1), and standardization amplifies the 1e-6 flip by 1/sd.
Features are 6dp-quantized, then
z-score standardized with fixed-point-summed moments (conditioning: the
near-constant ratio features otherwise act as runaway biases); classes are
balance-weighted (keep-rule positives dominate the fixture 10:1). Every
quantity on the update path is either a bigint sum or a 6dp-rounded
double, so the SQL oracle replays all rounds bit-for-bit (the k-means
unrolled-CTE treatment applied to supervised training).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize

from hierarchical_graph_db_spark.functions.text import (
    quality_keep,
    stopword_hits,
    tokens,
)

#: Fixed GD schedule — part of the operator contract (the oracle unrolls it).
LR_RATE = 8.0
LR_ROUNDS = 8

#: Feature names in weight order (index 0 is the bias).
LR_FEATURES = ("bias", "stopword_ratio", "alpha_ratio", "mean_token_len")


def _r6(x: float) -> float:
    """Driver twin of the cross-engine-stable 6dp quantization (module
    docstring): ``floor(x·1e6 + 0.5) / 1e6`` in plain IEEE doubles."""
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _r6c(c: F.Column) -> F.Column:
    """Column twin of :func:`_r6` — NOT ``F.round`` (see module docstring
    for the Spark-vs-DuckDB decimal-``…5`` divergence this avoids)."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def _cell(c: F.Column) -> F.Column:
    """A fixed-point sum cell: ``floor(x·1e6 + 0.5)`` as BIGINT (Spark's
    ``floor`` on DOUBLE already yields LongType)."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5))


def lr_features(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, f1, f2, f3, y): 6dp-quantized quality ratios + the
    ``quality_keep`` label as a double — the raw (pre-standardization)
    training table. One narrow projection over the scan."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    return (
        docs.where(F.length(F.trim(c)) > 0)
        .select(
            F.col(id_col),
            _r6c(stopword_hits(toks) / n_tok).alias("f1"),
            _r6c(F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
                 / F.length(c)).alias("f2"),
            _r6c(F.length(F.regexp_replace(c, r"\s+", ""))
                 / n_tok / 10).alias("f3"),
            quality_keep(c).cast("double").alias("y"),
        )
    )


def _fixed_stats(feats: DataFrame) -> dict:
    """n, npos, and per-feature fixed-point first/second moments — one
    map-side-collapsing aggregate; everything downstream is driver math."""
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(F.col("y").cast("bigint")).alias("npos")]
    for f in ("f1", "f2", "f3"):
        aggs.append(F.sum(_cell(F.col(f))).alias(f"s_{f}"))
        aggs.append(F.sum(_cell(F.col(f) * F.col(f))).alias(f"q_{f}"))
    return feats.agg(*aggs).collect()[0].asDict()


def lr_norm_constants(feats: DataFrame) -> dict:
    """Standardization + class-balance constants, all 6dp-quantized doubles
    derived from fixed-point sums (identical in the SQL replay): per
    feature mu/sd (population std, variance floored at 1e-12), and class
    weights cpos/cneg = n / (2·n_class)."""
    st = _fixed_stats(feats)
    n = st["n"]
    out = {"n": n,
           "cpos": _r6(n / (2 * st["npos"])),
           "cneg": _r6(n / (2 * (n - st["npos"])))}
    for f in ("f1", "f2", "f3"):
        mu = _r6((st[f"s_{f}"] / 1000000.0) / n)
        m2 = (st[f"q_{f}"] / 1000000.0) / n
        out[f"mu_{f}"] = mu
        out[f"sd_{f}"] = _r6(math.sqrt(max(m2 - mu * mu, 1e-12)))
    return out


def _standardized(feats: DataFrame, norm: dict) -> DataFrame:
    cols = [F.col("doc_id"), F.col("y"),
            F.when(F.col("y") == 1.0, F.lit(norm["cpos"]))
            .otherwise(F.lit(norm["cneg"])).alias("c")]
    for f in ("f1", "f2", "f3"):
        cols.append(
            _r6c((F.col(f) - F.lit(norm[f"mu_{f}"]))
                 / F.lit(norm[f"sd_{f}"])).alias(f))
    return feats.select(*cols)


def _fast_sigmoid(z: F.Column) -> F.Column:
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _z_expr(w: list[float]) -> F.Column:
    return (F.lit(w[0]) + F.lit(w[1]) * F.col("f1")
            + F.lit(w[2]) * F.col("f2") + F.lit(w[3]) * F.col("f3"))


def lr_train(docs: DataFrame, n_rounds: int = LR_ROUNDS,
             rate: float = LR_RATE) -> tuple[list[float], dict]:
    """Train the quality scorer; returns ``(weights, norm)`` with weights
    ``[bias, w_f1, w_f2, w_f3]`` over the standardized features. Per round:
    one 4-cell fixed-point gradient aggregate + a driver update."""
    feats = lr_features(docs)
    norm = lr_norm_constants(feats)
    # Materialize the standardized feature table ONCE: every GD round's
    # gradient aggregate otherwise re-evaluates the full lineage — regex
    # feature extraction over the whole corpus, n_rounds+1 corpus scans
    # where one suffices (at 100 TB this is the persisted feature table a
    # training job writes before the optimization loop). Values unchanged:
    # the checkpoint stores exactly the rows the lineage would produce.
    std = _standardized(feats, norm).transform(materialize)
    n = norm["n"]
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(n_rounds):
        r = F.col("c") * (_fast_sigmoid(_z_expr(w)) - F.col("y"))
        row = std.agg(
            F.sum(_cell(r)).alias("s0"),
            *[F.sum(_cell(r * F.col(f))).alias(f"s{i}")
              for i, f in enumerate(("f1", "f2", "f3"), start=1)],
        ).collect()[0]
        w = [_r6(w[j] - rate * ((row[f"s{j}"] / 1000000.0) / n))
             for j in range(4)]
    return w, norm


def lr_weight_table(docs: DataFrame, n_rounds: int = LR_ROUNDS,
                    rate: float = LR_RATE) -> DataFrame:
    """The trained weights as a 4-row DataFrame (feature, weight)."""
    w, _ = lr_train(docs, n_rounds, rate)
    return docs.sparkSession.createDataFrame(
        list(zip(LR_FEATURES, w)), "feature STRING, weight DOUBLE")


def lr_scores(docs: DataFrame, n_rounds: int = LR_ROUNDS,
              rate: float = LR_RATE) -> DataFrame:
    """Score every document with the trained model: (doc_id, score 6dp,
    predicted, label). The scoring pass is a pure projection — weights and
    normalization constants are plan literals, exactly like the k-means
    literal-centroid assignment."""
    w, norm = lr_train(docs, n_rounds, rate)
    std = _standardized(lr_features(docs), norm)
    score = _r6c(_fast_sigmoid(_z_expr(w)))
    return std.select(
        "doc_id",
        score.alias("score"),
        (score >= 0.5).alias("predicted"),
        F.col("y").cast("int").alias("label"),
    )
