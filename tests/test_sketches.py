"""Sketch accuracy bounds: HLL distinct counts within rsd of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import load


def test_percentile_approx_within_error_bound(spark, sf_dir):
    """t-digest (percentile_approx) vs exact percentile: relative error must
    stay inside the accuracy implied by the 1000-bucket setting — the
    production swap documented in agg_exact_percentiles."""
    li = Catalog(spark, sf_dir).lineitem
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact50"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 1000)").alias("approx50"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("exact99"),
        F.expr("percentile_approx(l_extendedprice, 0.99, 1000)").alias("approx99"),
    ).collect()[0]
    assert abs(row["approx50"] - row["exact50"]) / row["exact50"] < 0.02
    assert abs(row["approx99"] - row["exact99"]) / row["exact99"] < 0.02


def test_hll_within_error_bound(spark, sf_dir):
    out = {r["event_type"]: r["approx_users"]
           for r in load()["agg_hll_distinct"].run(spark, sf_dir).collect()}
    exact = {r["event_type"]: r["n"]
             for r in Catalog(spark, sf_dir).events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert set(out) == set(exact)
    for et, approx in out.items():
        rel_err = abs(approx - exact[et]) / exact[et]
        assert rel_err <= 0.10, f"{et}: approx {approx} vs exact {exact[et]}"

def test_cms_overestimates_within_collision_bound(spark):
    """CMS invariants on a skewed synthetic stream: est ≥ truth always, and
    est ≤ truth + N/width × depth-slack (loose deterministic form of the
    classic ε-bound — collisions in EVERY row must all hit the same item
    for the min to stay inflated)."""
    from pyspark.sql import functions as F

    from hierarchical_graph_db_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(f"item_{i % 50}",) for i in range(2000)] + [("hot",)] * 500
    items = spark.createDataFrame(rows, "item string")
    n = items.count()
    width, depth = 32, 4
    sketch = cms_build(items, "item", width=width, depth=depth)
    # the grid never exceeds depth×width cells and column ids stay in range
    cells = sketch.collect()
    assert len(cells) <= depth * width
    assert all(0 <= r["col"] < width and 0 <= r["r"] < depth for r in cells)
    assert sum(r["c"] for r in cells) == n * depth

    est = {
        r["item"]: r["est_n"]
        for r in cms_estimate(sketch, items.distinct(), "item",
                              width=width, depth=depth).collect()
    }
    truth = {
        r["item"]: r["n"]
        for r in items.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t, f"{k}: CMS under-estimated"
        assert est[k] <= t + n, "estimate exceeds trivial bound"
    # the heavy hitter is still clearly separable from the tail
    assert est["hot"] >= 500
    assert est["hot"] > max(v for k, v in est.items() if k != "hot")


def test_cms_out_of_vocabulary_probe_counts_empty_cells_as_zero(spark):
    """A probe absent from the data must estimate 0 unless EVERY one of its
    depth cells collides — empty cells are zeros, not dropped rows."""
    from hierarchical_graph_db_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    items = spark.createDataFrame([("only_item",)] * 10, "item string")
    # width large enough that an unseen probe is overwhelmingly unlikely to
    # collide with the single occupied cell in all 4 rows
    sketch = cms_build(items, "item", width=1024, depth=4)
    probes = spark.createDataFrame([("never_seen",), ("only_item",)],
                                   "item string")
    est = {r["item"]: r["est_n"]
           for r in cms_estimate(sketch, probes, "item",
                                 width=1024, depth=4).collect()}
    assert est["only_item"] == 10
    assert est["never_seen"] == 0


def test_portable_hll_within_error_bound(spark, sf_dir):
    """The sha256-register HLL (sketch_hll_distinct, m=1024) against exact
    distinct counts: rsd ≈ 1.04/√1024 = 3.25%; allow 3σ (10%) on the small
    fixture groups, and ≤5% on a 20k-key synthetic — production-form
    accuracy, not the m=64 demo bound."""
    from hierarchical_graph_db_spark.operators.sketches import hll_distinct

    out = {r["event_type"]: r["est_users"]
           for r in load()["sketch_hll_distinct"].run(spark, sf_dir).collect()}
    exact = {r["event_type"]: r["n"]
             for r in Catalog(spark, sf_dir).events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert set(out) == set(exact)
    for et, est in out.items():
        assert abs(est - exact[et]) / exact[et] <= 0.10, (et, est, exact[et])

    big = spark.range(20_000).select(
        F.lit("g").alias("g"), F.col("id").alias("k"))
    est = hll_distinct(big, "k", ["g"], m=1024).collect()[0]["est_users"]
    assert abs(est - 20_000) / 20_000 <= 0.05


def test_portable_hll_register_widths(spark):
    """Every supported register count stays inside 3·rsd on the same 20k-key
    stream, and accuracy improves monotonically band-to-band (13% / 6.5% /
    3.25% rsd for m=64/256/1024)."""
    from hierarchical_graph_db_spark.operators.sketches import hll_distinct

    big = spark.range(20_000).select(
        F.lit("g").alias("g"), F.col("id").alias("k"))
    for m, rsd in ((64, 0.13), (256, 0.065), (1024, 0.0325)):
        est = hll_distinct(big, "k", ["g"], m=m).collect()[0]["est_users"]
        assert abs(est - 20_000) / 20_000 <= 3 * rsd, (m, est)

    import pytest

    with pytest.raises(ValueError, match="oracle replay"):
        hll_distinct(big, "k", ["g"], m=128)


def test_hll_partials_merge_losslessly(spark, sf_dir):
    """Register max is associative: merging per-day partials must land on
    the BIT-IDENTICAL estimate as the direct whole-range computation —
    the property that licenses persisting sketch partials at 100 TB."""
    from hierarchical_graph_db_spark.queries import load

    direct = {r["event_type"]: r["est_users"]
              for r in load()["sketch_hll_distinct"].run(spark, sf_dir).collect()}
    merged = {r["event_type"]: r["est_users"]
              for r in load()["sketch_hll_mergeable_rollup"]
              .run(spark, sf_dir).collect()}
    assert merged == direct


def test_sample_quantiles_rank_error_bounded(spark, sf_dir):
    """25% hash-sample quantiles must land within a small rank error of the
    full-data exact quantiles (DKW-style concentration at n≈500/group)."""
    from hierarchical_graph_db_spark.io import Catalog
    from hierarchical_graph_db_spark.operators.sketches import (
        sample_quantiles,
    )

    ev = Catalog(spark, sf_dir).events
    est = {r["event_type"]: r for r in sample_quantiles(
        ev, "value", ["event_type"], key_col="event_id", rate=0.25
    ).collect()}
    exact = {r["event_type"]: r for r in ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n"),
    ).collect()}
    for t, e in exact.items():
        # convert value error to rank error via the empirical CDF
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            v_est = est[t][col]
            rank = (ev.where(F.col("event_type") == t)
                    .where(F.col("value") <= v_est).count()) / e["n"]
            assert abs(rank - q) < 0.08, (t, col, rank)
        # sample size is governed by the rate
        assert 0.1 * e["n"] < est[t]["n_sample"] < 0.45 * e["n"]


def test_hll_set_operations_within_error(spark, sf_dir):
    """Union is an exact sketch operation (register max) so its error is
    plain HLL error; the I-E intersection inherits the sum of errors —
    bound both against exact counts."""
    from hierarchical_graph_db_spark.queries import load

    row = load()["sketch_hll_set_operations"].run(spark, sf_dir).collect()[0]
    from hierarchical_graph_db_spark.io import Catalog

    ev = Catalog(spark, sf_dir).events
    users = lambda t: {r["user_id"] for r in ev.where(
        F.col("event_type") == t).select("user_id").distinct().collect()}
    a, b = users("view"), users("purchase")
    assert abs(row["est_union"] - len(a | b)) / len(a | b) < 0.15
    inter = len(a & b)
    if inter:
        assert abs(row["est_intersection"] - inter) / inter < 0.3
