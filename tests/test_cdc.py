"""CDC changelog semantics on hand-built inputs: every MERGE path —
last-writer-wins netting, upsert-on-absent, delete tombstones (incl. on
absent keys), insert-on-existing (treated as replace), and aggregate-view
deltas with retractions and group moves."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.maintenance import (
    agg_view_changelog_delta,
    apply_changelog,
    changelog_net,
)

BASE_SCHEMA = "k bigint, grp string, m bigint"
CHG_SCHEMA = "k bigint, seq int, op string, grp string, m bigint"


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        BASE_SCHEMA)


def _changes(spark):
    return spark.createDataFrame(
        [
            (1, 1, "U", "a", 11),   # plain update
            (2, 1, "U", "b", 25),   # update that MOVES groups a -> b
            (2, 2, "D", "b", 99),   # ...then deleted: LWW picks seq 2
            (3, 1, "D", "b", 0),    # delete
            (3, 2, "I", "c", 33),   # ...then re-inserted into a new group
            (5, 1, "U", "c", 50),   # U on absent key -> insert
            (6, 1, "D", "c", 0),    # D on absent key -> no-op
            (4, 1, "I", "b", 44),   # I on existing key -> replace
        ],
        CHG_SCHEMA)


def test_changelog_net_last_writer_wins(spark):
    net = {r["k"]: (r["op"], r["grp"], r["m"])
           for r in changelog_net(_changes(spark), ["k"], "seq", "op")
           .collect()}
    assert net[2] == ("D", "b", 99)
    assert net[3] == ("I", "c", 33)
    assert len(net) == 6


def test_apply_changelog_all_paths(spark):
    out = {r["k"]: (r["grp"], r["m"])
           for r in apply_changelog(_base(spark), _changes(spark), ["k"])
           .collect()}
    assert out == {
        1: ("a", 11),   # updated
        3: ("c", 33),   # deleted then re-inserted
        4: ("b", 44),   # replaced by I
        5: ("c", 50),   # upserted on absent
        # 2 deleted; 6's delete was a no-op
    }


def test_agg_view_delta_matches_recompute(spark):
    base, changes = _base(spark), _changes(spark)
    delta = {r["grp"]: (r["d_count"], r["d_sum"])
             for r in agg_view_changelog_delta(
                 base, changes, ["k"], "grp", "m").collect()}
    old = {r["grp"]: (r["c"], r["s"]) for r in
           base.groupBy("grp").agg(F.count("*").alias("c"),
                                   F.sum("m").alias("s")).collect()}
    new = {r["grp"]: (r["c"], r["s"]) for r in
           apply_changelog(base, changes, ["k"])
           .groupBy("grp").agg(F.count("*").alias("c"),
                               F.sum("m").alias("s")).collect()}
    for g in set(old) | set(new) | set(delta):
        oc, os_ = old.get(g, (0, 0))
        dc, ds = delta.get(g, (0, 0))
        nc, ns = new.get(g, (0, 0))
        assert (oc + dc, os_ + ds) == (nc, ns), g
    # zero-delta groups are suppressed
    assert all(dc != 0 or ds != 0 for dc, ds in delta.values())


def test_apply_changelog_plan_shape(spark):
    """The net aggregate partial-collapses map-side (HashAggregate, no
    window/sort over the changelog) and the base side joins ANTI — the
    O(|base|+|changes|) contract."""
    plan = apply_changelog(_base(spark), _changes(spark), ["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "Window" not in plan and "WindowExec" not in plan
