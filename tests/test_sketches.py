"""Sketch accuracy bounds: HLL distinct counts within rsd of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import load


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