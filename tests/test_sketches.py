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