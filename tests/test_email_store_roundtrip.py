"""The reference-user workflow end-to-end: maildir → ingest → partitioned
parquet store → indexed-style reads on the store (sender equality, date
range, mailbox lookup) with pushdown verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import write_parquet
from hierarchical_graph_db_spark.sources.maildir import ingest_maildir

MSG = """\
Message-ID: <m{i}@x>
Date: Mon, {day:02d} May 2001 10:00:00 +0000
From: sender{s}@x.com
To: rcpt{r}@x.com
Subject: msg {i}

body {i}
"""


def test_store_roundtrip_queries(spark, tmp_path):
    base = tmp_path / "mail"
    for i in range(20):
        d = base / f"user{i % 3}" / "inbox"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{i}_").write_text(
            MSG.format(i=i, day=(i % 10) + 1, s=i % 4, r=(i + 1) % 4))

    merged = ingest_maildir(spark, str(base)).withColumn(
        "date_day", F.date_format("date", "yyyy-MM-dd"))
    store = str(tmp_path / "emails_store")
    write_parquet(merged, store, partition_by=["date_day"])

    emails = spark.read.parquet(store)

    # Q3: sender equality — predicate must reach the parquet scan
    by_sender = emails.where(F.col("from") == "sender1@x.com")
    plan = by_sender._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "sender1@x.com" in plan
    assert by_sender.count() == 5  # i = 1, 5, 9, 13, 17

    # Q5: date range → partition pruning on the date_day layout
    ranged = emails.where(F.col("date_day") == "2001-05-03")
    rplan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in rplan
    assert ranged.count() == 2  # i = 2, 12

    # Q6: mailbox (user, folder) lookup over the merged struct array
    in_user0 = emails.where(
        F.exists("mailboxes",
                 lambda m: (m["user"] == "user0") & (m["folder"] == "inbox")))
    assert in_user0.count() == 7  # i = 0, 3, 6, 9, 12, 15, 18

    # Q4: recipient membership
    assert emails.where(F.array_contains("to", "rcpt2@x.com")).count() == 5
