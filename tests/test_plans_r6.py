"""Plan-shape gates for the round-6 session operators: positive assertions
(the shape we WANT is present), complementing tools/plan_audit.py's
negative antipattern sweep."""

from __future__ import annotations

from hierarchical_graph_db_spark.queries import load

REGISTRY = load()


def _plan(spark, sf_dir, name: str) -> str:
    return (REGISTRY[name].run(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())


def test_skyline_prunes_via_broadcast_no_self_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "skyline_price_size")
    # the prefix-max prune table joins broadcast; the oracle's NOT EXISTS
    # all-pairs shape must never appear
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") == 0


def test_mad_outliers_broadcasts_group_constants(spark, sf_dir):
    plan = _plan(spark, sf_dir, "anomaly_mad_outliers")
    # both join-backs (median, MAD) must be broadcast — the fact is never
    # shuffled outside the two grouped percentile passes
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_textrank_pair_build_has_no_positional_self_join(spark, sf_dir):
    # the final plan scans the checkpointed iteration state (lineage cut
    # per round), so assert the BUILD's shape directly: the pair
    # generation must be slice/zip expressions with no join at all
    from hierarchical_graph_db_spark.functions.text import tokens
    from hierarchical_graph_db_spark.io import Catalog
    from pyspark.sql import functions as F

    docs = Catalog(spark, sf_dir).documents
    ts = tokens("text")
    pairs = (
        docs.select(ts.alias("ts"))
        .where(F.size("ts") >= 2)
        .select(F.explode(F.arrays_zip(
            F.slice("ts", 1, F.size("ts") - 1).alias("x"),
            F.slice(F.col("ts"), 2, F.size("ts") - 1).alias("y"),
        )).alias("p"))
    )
    build = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in build
    assert "slice" in build
    # and the full query never degrades to a cartesian anywhere
    plan = _plan(spark, sf_dir, "text_textrank_keywords")
    assert "CartesianProduct" not in plan


def test_cdc_incremental_view_never_reaggregates_base(spark, sf_dir):
    # the maintained view's plan holds signed-delta aggregates and the
    # full-outer merges — but no Window and no cartesian
    plan = _plan(spark, sf_dir, "cdc_incremental_agg_view")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_frequent_triples_generates_combos_in_project(spark, sf_dir):
    plan = _plan(spark, sf_dir, "assoc_frequent_triples")
    # basket-local combination generation: transform/slice lambdas, no
    # 3-way basket self-join (at most the item-prune + count joins)
    assert "CartesianProduct" not in plan
    assert "transform" in plan and "slice" in plan
