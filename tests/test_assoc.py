"""Unit tests for pair-level association rules (operators/assoc.py).
Oracle parity is covered by the registry query assoc_rules_event_pairs;
this pins support/confidence/lift arithmetic on a crafted basket set."""

from __future__ import annotations

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.assoc import pair_association_rules


def test_pair_rules_support_confidence_lift(spark):
    rows = [
        ("u1", "d1", "A"), ("u1", "d1", "B"),
        ("u1", "d2", "A"),
        ("u2", "d1", "A"), ("u2", "d1", "B"), ("u2", "d1", "C"),
        ("u3", "d1", "B"), ("u3", "d1", "C"),
        # duplicate occurrences inside a basket must not inflate counts
        ("u3", "d1", "C"),
    ]
    ev = spark.createDataFrame(
        [Row(user=u, day=d, item=i) for u, d, i in rows])
    got = {(r["antecedent"], r["consequent"]): r
           for r in pair_association_rules(
               ev, basket_cols=["user", "day"], item_col="item",
               min_pair_support=2).collect()}
    # n_baskets=4; supports A=3 B=3 C=2; pairs AB=2 BC=2 (AC=1 pruned)
    assert set(got) == {("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")}
    ab = got[("A", "B")]
    assert ab["pair_count"] == 2
    assert ab["support"] == 0.5
    assert ab["confidence"] == round(2 / 3, 6)
    assert ab["lift"] == round(2 * 4 / (3 * 3), 6)
    bc = got[("B", "C")]
    assert bc["confidence"] == round(2 / 3, 6)
    assert bc["lift"] == round(2 * 4 / (3 * 2), 6)
    cb = got[("C", "B")]
    assert cb["confidence"] == 1.0  # C always co-occurs with B
