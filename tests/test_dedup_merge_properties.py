"""Property-based tests for the reference's central operator (A1–A3):
`dedup_merge` (first-writer-wins + member set-union in one aggregate) and
`merge_into` (the incremental MERGE emulation) vs pure-Python models on
randomized row multisets. The fixed tests pin idempotence and walk-order
cases; these check the algebra itself — FWW picks the (order_by)-min
writer's payload, members are a SET (duplicates collapse, order-free),
n_duplicates counts delivered rows, and the batch/one-shot split is
invisible: merge_into(dedup_merge(part1), part2) must equal
dedup_merge(whole) up to the delivered-row counter semantics documented
in merge_into."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

SCHEMA = "dk string, ord bigint, payload string, src string"

# (dedupe_key, order, payload, member-source); small domains force
# collisions in every dimension.
_rows = st.lists(
    st.tuples(st.sampled_from("xyz"), st.integers(0, 9),
              st.sampled_from(["p1", "p2", "p3"]),
              st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=14,
)


def _model(rows):
    """Per key: payload of the min-(ord, payload, src) writer (the test's
    order_by includes all columns, making the order total even when `ord`
    ties), member set, delivered count."""
    out = {}
    for dk, o, p, s in rows:
        m = out.setdefault(dk, {"best": None, "members": set(), "n": 0})
        key = (o, p, s)
        if m["best"] is None or key < m["best"]:
            m["best"] = key
        m["members"].add(s)
        m["n"] += 1
    return {
        dk: (m["best"][1], m["best"][0], frozenset(m["members"]), m["n"])
        for dk, m in out.items()
    }


def _collapse(df):
    return {
        r["dedupe_key"]: (r["payload"], r["ord"],
                          frozenset(x["src"] for x in r["members"]),
                          r["n_duplicates"])
        for r in df.collect()
    }


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_rows)
def test_dedup_merge_matches_fww_model(spark, rows):
    from hierarchical_graph_db_spark.operators.dedup_merge import dedup_merge

    df = spark.createDataFrame(rows, SCHEMA)
    got = _collapse(dedup_merge(df, "dk", ["ord", "payload", "src"], ["src"]))
    assert got == _model(rows)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=_rows, cut=st.integers(0, 14))
def test_merge_into_split_point_is_invisible(spark, rows, cut):
    """Any batch boundary must be invisible: merging part2 into the
    dedup-merged part1 equals one-shot dedup_merge of the whole — except
    that FWW is only guaranteed against the INGEST order (a later batch
    never overwrites an existing key's payload, per the reference's
    $setOnInsert), so the model takes part1's winner when the key exists
    in part1."""
    from hierarchical_graph_db_spark.operators.dedup_merge import (
        dedup_merge,
        merge_into,
    )

    cut = min(cut, len(rows))
    p1, p2 = rows[:cut], rows[cut:]
    order = ["ord", "payload", "src"]
    if not p1:
        merged = dedup_merge(spark.createDataFrame(p2, SCHEMA),
                             "dk", order, ["src"])
    else:
        t = dedup_merge(spark.createDataFrame(p1, SCHEMA),
                        "dk", order, ["src"])
        if p2:
            merged = merge_into(t, spark.createDataFrame(p2, SCHEMA),
                                "dk", order, ["src"])
        else:
            merged = t
    got = _collapse(merged)
    whole = _model(rows)
    first = _model(p1)
    want = {}
    for dk, (pay, o, mem, n) in whole.items():
        if dk in first:  # key existed: payload pinned at part1's winner
            pay, o = first[dk][0], first[dk][1]
        want[dk] = (pay, o, mem, n)
    assert got == want