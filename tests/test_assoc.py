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


def test_item_item_cosine_math_and_mega_basket_guard(spark):
    from hierarchical_graph_db_spark.operators.assoc import (
        item_item_cosine_topk,
    )

    # baskets: {1:AB, 2:AB, 3:AC}; c_A=3 c_B=2 c_C=1; c_AB=2, c_AC=1
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
    b = spark.createDataFrame(rows, "bk: bigint, item: string")
    out = {(r["item"], r["neighbor"]): (r["pair_count"], r["cosine"])
           for r in item_item_cosine_topk(b, "bk", "item", k=3).collect()}
    import math
    assert out[("A", "B")] == (2, round(2 / math.sqrt(3 * 2), 6))
    assert out[("B", "A")] == (2, round(2 / math.sqrt(2 * 3), 6))
    assert out[("A", "C")] == (1, round(1 / math.sqrt(3 * 1), 6))
    # a mega-basket above the cap contributes nothing
    mega = [(9, x) for x in "ABCDEFGH"]
    b2 = spark.createDataFrame(rows + mega, "bk: bigint, item: string")
    capped = item_item_cosine_topk(b2, "bk", "item", k=3,
                                   max_basket_items=4)
    got = {(r["item"], r["neighbor"]): r["pair_count"]
           for r in capped.collect()}
    assert got[("A", "B")] == 2          # unchanged by the dropped basket
    assert ("D", "E") not in got         # mega-basket pairs never counted


# --- frequent triples (Apriori level 3) --------------------------------------


def test_frequent_triples_hand_counts(spark):
    from hierarchical_graph_db_spark.operators.assoc import frequent_triples

    rows = []
    # baskets: b1 {a,b,c}, b2 {a,b,c,d}, b3 {a,b,d}, b4 {a,b,c}
    for bid, items in [(1, "abc"), (2, "abcd"), (3, "abd"), (4, "abc")]:
        for it in items:
            rows.append((bid, it))
    b = spark.createDataFrame(rows, "bid bigint, item string")
    out = {(r["a"], r["b"], r["c"]): (r["n_baskets"], r["support"])
           for r in frequent_triples(b, ["bid"], "item",
                                     min_item_count=1,
                                     min_triple_count=2).collect()}
    # abc in b1,b2,b4 = 3; abd in b2,b3 = 2; acd/bcd only once -> dropped
    assert out[("a", "b", "c")] == (3, 0.75)
    assert out[("a", "b", "d")] == (2, 0.5)
    assert set(out) == {("a", "b", "c"), ("a", "b", "d")}


def test_frequent_triples_item_prune_drops_rare(spark):
    from hierarchical_graph_db_spark.operators.assoc import frequent_triples

    rows = [(i, it) for i in range(1, 5) for it in "abc"] + [(1, "z")]
    b = spark.createDataFrame(rows, "bid bigint, item string")
    out = frequent_triples(b, ["bid"], "item", min_item_count=2,
                           min_triple_count=2).collect()
    # z is infrequent -> never reaches combination generation
    assert all("z" not in (r["a"], r["b"], r["c"]) for r in out)
    assert [(r["a"], r["b"], r["c"]) for r in out] == [("a", "b", "c")]


def test_triple_combos_complete_and_unique(spark):
    from hierarchical_graph_db_spark.operators.assoc import frequent_triples
    from itertools import combinations

    items = list("abcdefg")
    rows = [(1, it) for it in items]
    b = spark.createDataFrame(rows, "bid bigint, item string")
    out = {(r["a"], r["b"], r["c"])
           for r in frequent_triples(b, ["bid"], "item", min_item_count=1,
                                     min_triple_count=1).collect()}
    assert out == set(combinations(items, 3))  # C(7,3) = 35, each once
