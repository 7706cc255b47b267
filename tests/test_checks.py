"""Declarative constraint suite (operators/checks.py).

The registry oracle (quality_constraint_suite) hash-checks the full report
over the fixtures; these tests pin the operator-level contracts the oracle
can't see: metric math on known data, the vacuous-pass rule on empty input,
orphan detection in referential integrity, and the one-aggregation /
broadcast-RI plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators import checks as C


def _report(df):
    return {(r["check"], r["column"]): r for r in df.collect()}


def test_metrics_on_known_data(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, None, 500.0), (3, "a", None)],
        "id: bigint, tag: string, v: double",
    )
    rep = _report(C.run_checks(df, [
        C.completeness("tag", 1.0),          # 3/4
        C.uniqueness("id", 1.0),             # 3 distinct / 4 non-null
        C.in_range("v", 0, 100, 0.5),        # 2/4 (null fails between)
        C.in_set("tag", ["a", "b"], 0.5),    # 3/4
        C.matches("tag", "^a$", 0.25),       # 2/4
    ]))
    assert rep[("completeness", "tag")]["observed"] == 0.75
    assert not rep[("completeness", "tag")]["passed"]
    assert rep[("uniqueness", "id")]["observed"] == 0.75
    assert rep[("in_range", "v")]["observed"] == 0.5
    assert rep[("in_range", "v")]["passed"]
    assert rep[("in_set", "tag")]["observed"] == 0.75
    assert rep[("matches", "tag")]["observed"] == 0.5
    assert rep[("matches", "tag")]["passed"]


def test_empty_table_passes_vacuously(spark):
    df = spark.createDataFrame([], "id: bigint, tag: string")
    rep = _report(C.run_checks(df, [
        C.completeness("tag", 1.0), C.uniqueness("id", 1.0)]))
    assert all(r["observed"] == 1.0 and r["passed"] for r in rep.values())


def test_referential_integrity_counts_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk: bigint")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk: bigint")
    row = C.referential_integrity(fact, "fk", dim, "pk", 0.9).collect()[0]
    assert row["observed"] == 0.5  # 2 of 4 resolve (orphan 9, null fk)
    assert not row["passed"]
    assert row["check"] == "ref_integrity" and row["column"] == "fk"


def test_ri_duplicate_dim_keys_do_not_double_count(spark):
    fact = spark.createDataFrame([(1,), (1,), (2,)], "fk: bigint")
    dim = spark.createDataFrame([(1,), (1,), (1,)], "pk: bigint")
    row = C.referential_integrity(fact, "fk", dim, "pk", 0.5).collect()[0]
    assert row["observed"] == round(2 / 3, 6)
    assert row["passed"]


def test_suite_is_one_aggregation_no_join(spark):
    """N row-local checks must cost one scan + one aggregation: the plan has
    no Join and exactly one source scan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"))
    plan = C.run_checks(df, [
        C.completeness("m"), C.in_range("m", 0, 3, 0.5),
        C.uniqueness("id"), C.matches("m", "1", 0.0),
    ])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Range (0, 100") == 1


def test_ri_dim_side_broadcasts(spark):
    fact = spark.range(1000).select(F.col("id").alias("fk"))
    dim = spark.range(10).select(F.col("id").alias("pk"))
    plan = C.referential_integrity(fact, "fk", dim, "pk") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
