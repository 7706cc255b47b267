"""Property tests for the dedup-merge operator (SURVEY.md §5c).

Reference semantics under test (app/agents/parsing_agent.py:67-86):
first-writer-wins payload, set-merged membership, idempotent re-ingest.
"""

from __future__ import annotations

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.dedup_merge import (
    dedup_merge,
    ingest_counters,
    merge_into,
    observed_merge,
)

ROWS = [
    # key k1 appears 3×: first writer by (user, folder, filename) is (a, inbox, 1)
    Row(key="k1", subject="first", user="a", folder="inbox", filename="1"),
    Row(key="k1", subject="later", user="b", folder="sent", filename="2"),
    Row(key="k1", subject="later2", user="a", folder="spam", filename="3"),
    Row(key="k2", subject="only", user="c", folder="inbox", filename="4"),
    # exact duplicate membership rows collapse in the set
    Row(key="k3", subject="dup", user="d", folder="inbox", filename="5"),
    Row(key="k3", subject="dup", user="d", folder="inbox", filename="5"),
]


def _merged(spark):
    df = spark.createDataFrame(ROWS)
    return dedup_merge(
        df,
        key="key",
        order_by=["user", "folder", "filename"],
        member_cols=["user", "folder", "filename"],
        payload_cols=["subject"],
    )


def test_first_writer_wins(spark):
    out = {r["dedupe_key"]: r for r in _merged(spark).collect()}
    assert out["k1"]["subject"] == "first"
    assert out["k2"]["subject"] == "only"


def test_members_are_a_set(spark):
    out = {r["dedupe_key"]: r for r in _merged(spark).collect()}
    k1_members = {(m["user"], m["folder"], m["filename"]) for m in out["k1"]["members"]}
    assert k1_members == {("a", "inbox", "1"), ("b", "sent", "2"), ("a", "spam", "3")}
    # identical membership rows dedupe (the $addToSet contract)
    assert len(out["k3"]["members"]) == 1
    assert out["k3"]["n_duplicates"] == 2


def test_order_insensitivity(spark):
    """Shuffling input row order never changes the merged result."""
    base = {r["dedupe_key"]: (r["subject"], frozenset(map(tuple, r["members"])))
            for r in _merged(spark).collect()}
    df_rev = spark.createDataFrame(list(reversed(ROWS)))
    merged_rev = dedup_merge(df_rev, key="key",
                             order_by=["user", "folder", "filename"],
                             member_cols=["user", "folder", "filename"],
                             payload_cols=["subject"])
    rev = {r["dedupe_key"]: (r["subject"], frozenset(map(tuple, r["members"])))
           for r in merged_rev.collect()}
    assert base == rev


def test_merge_into_idempotent(spark):
    """Re-ingesting the same batch is a no-op (exactly-once effects)."""
    df = spark.createDataFrame(ROWS)
    target = dedup_merge(df, key="key", order_by=["user", "folder", "filename"],
                         member_cols=["user", "folder", "filename"],
                         payload_cols=["subject"])
    again = merge_into(target, df, key="key",
                       order_by=["user", "folder", "filename"],
                       member_cols=["user", "folder", "filename"],
                       payload_cols=["subject"])
    a = {(r["dedupe_key"], r["subject"], frozenset(map(tuple, r["members"])))
         for r in target.collect()}
    b = {(r["dedupe_key"], r["subject"], frozenset(map(tuple, r["members"])))
         for r in again.collect()}
    assert a == b


def test_merge_into_inserts_new_keys(spark):
    df = spark.createDataFrame(ROWS)
    target = dedup_merge(df, key="key", order_by=["user", "folder", "filename"],
                         member_cols=["user", "folder", "filename"],
                         payload_cols=["subject"])
    batch = spark.createDataFrame([
        Row(key="k9", subject="new", user="z", folder="inbox", filename="9"),
        Row(key="k1", subject="ignored", user="z", folder="late", filename="8"),
    ])
    out = {r["dedupe_key"]: r for r in merge_into(
        target, batch, key="key", order_by=["user", "folder", "filename"],
        member_cols=["user", "folder", "filename"], payload_cols=["subject"],
    ).collect()}
    assert out["k9"]["subject"] == "new"           # inserted
    assert out["k1"]["subject"] == "first"          # payload untouched
    members = {tuple(m) for m in out["k1"]["members"]}
    assert ("z", "late", "8") in members            # membership unioned


def test_observed_merge_piggybacks_counters(spark, tmp_path):
    """Counters ride the write action — no extra jobs — and equal the
    two-pass ingest_counters values."""
    df = spark.createDataFrame(ROWS)
    merged, metrics = observed_merge(
        df, key="key", order_by=["user", "folder", "filename"],
        member_cols=["user", "folder", "filename"], payload_cols=["subject"])
    merged.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert metrics() == {"total_seen": 6, "total_upserts": 3,
                         "total_member_merges": 3}


def test_ingest_counters(spark):
    df = spark.createDataFrame(ROWS)
    merged = dedup_merge(df, key="key", order_by=["user", "folder", "filename"],
                         member_cols=["user", "folder", "filename"],
                         payload_cols=["subject"])
    c = ingest_counters(df, merged)
    assert c == {"total_seen": 6, "total_upserts": 3, "total_member_merges": 3}


def test_golden_record_survivorship_rules(spark):
    """Longest-text, majority-vote, and deterministic tie-breaks on a
    hand-built cluster (pipeline-independent: clusters supplied directly
    through the same aggregation rules the registry query uses)."""
    from pyspark.sql import functions as F

    rows = [
        # cluster 1: longest text wins; lang majority en (2v1);
        # source tie a/b broken lexicographically -> a
        (1, 1, "short", "en", "a", 5),
        (2, 1, "the longest text here", "en", "b", 21),
        (3, 1, "mid length", "de", "a", 10),
        # cluster 2: equal lengths -> lower doc_id wins the text rule
        (7, 2, "same len", "fr", "c", 8),
        (8, 2, "also len", "fr", "c", 8),
    ]
    clustered = spark.createDataFrame(
        rows, "doc_id: bigint, cluster_id: bigint, text: string, "
              "lang: string, source: string, n_chars: bigint")
    order_key = ((F.lit(100000) - F.col("n_chars")).cast("bigint")
                 * F.lit(1000000000) + F.col("doc_id"))
    main = clustered.groupBy("cluster_id").agg(
        F.min_by("text", order_key).alias("golden_text"),
        F.min_by("doc_id", order_key).alias("text_doc_id"))
    got = {r["cluster_id"]: (r["golden_text"], r["text_doc_id"])
           for r in main.collect()}
    assert got[1] == ("the longest text here", 2)
    assert got[2] == ("same len", 7)
    cnt = clustered.groupBy("cluster_id", "source").agg(
        F.count(F.lit(1)).alias("cnt"))
    key = F.concat(F.lpad((F.lit(100000) - F.col("cnt")).cast("string"),
                          6, "0"), F.col("source"))
    maj = {r["cluster_id"]: r["source"]
           for r in cnt.groupBy("cluster_id")
           .agg(F.min_by("source", key).alias("source")).collect()}
    assert maj[1] == "a"   # 2-2 tie in (a, b)? a:2, b:1 -> a wins on count
    assert maj[2] == "c"
