"""Property-based tests: the algebraic sketch contracts on randomized
data (round-14 extension; the fixture-point versions live in
tests/test_sketches.py).

* CMS — ``estimate(x) ≥ true_count(x)`` for EVERY probed item on ANY
  input (the count-min guarantee is deterministic, not probabilistic —
  collisions only ever ADD), and an out-of-vocabulary probe estimates
  ≥ 0 with empty cells counting as zero.
* HLL — the register table is a max-monoid: building per-part registers
  over a random split and merging them is REGISTER-EXACT equal to
  building over the whole input (max is associative and commutative),
  so distributed partial aggregation can never change an estimate.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_items = st.lists(st.sampled_from("abcdef"), min_size=1, max_size=20)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(items=_items)
def test_cms_never_undercounts_any_item(spark, items):
    from hierarchical_graph_db_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([(x,) for x in items], "item string")
    sketch = cms_build(df, "item", width=8, depth=2)  # narrow → collisions
    probes = spark.createDataFrame(
        [(x,) for x in sorted(set(items) | {"zz-oov"})], "item string")
    got = {r["item"]: r["est_n"]
           for r in cms_estimate(sketch, probes, "item",
                                 width=8, depth=2).collect()}
    true = Counter(items)
    for x, n in true.items():
        assert got[x] >= n, (x, got[x], n)
    assert got["zz-oov"] >= 0


_split_items = st.lists(
    st.tuples(st.integers(0, 2), st.sampled_from("abcdefgh")),
    min_size=1, max_size=20,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_split_items)
def test_hll_merge_is_register_exact_under_any_split(spark, rows):
    from hierarchical_graph_db_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )

    df = spark.createDataFrame(rows, "part bigint, item string")
    per_part = hll_registers(df, "item", ["part"], m=64)
    merged = hll_merge(per_part.drop("part"), [])
    direct = hll_registers(df, "item", [], m=64)
    a = {(r["reg"], r["m_j"]) for r in merged.collect()}
    b = {(r["reg"], r["m_j"]) for r in direct.collect()}
    assert a == b
