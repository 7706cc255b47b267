"""applyInPandasWithState: per-key state must persist across micro-batches."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from hierarchical_graph_db_spark.schemas import FIXTURES
from hierarchical_graph_db_spark.streaming.stateful import running_user_totals


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    mk = lambda i, u, v: Row(event_id=i, ts=dt.datetime(2024, 1, 1, 0, i),
                             user_id=u, event_type="click", value=v, props="{}")
    landing = tmp_path / "landing"
    landing.mkdir()
    batches = [
        [mk(1, 1, 10.0), mk(2, 1, 5.0), mk(3, 2, 1.0)],
        [mk(4, 1, 2.5), mk(5, 3, 7.0)],
    ]
    now = 1_700_000_000
    for i, rows in enumerate(batches):
        d = str(landing / f"b{i}")
        spark.createDataFrame(rows, FIXTURES["events"]).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i * 100, now + i * 100))

    stream = (
        spark.readStream.schema(FIXTURES["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing) + "/*")
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory").queryName("state_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("state_t").collect()
    # update mode: one emission per (batch, user-seen); the LAST emission per
    # user carries the accumulated running totals
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["n_events"], r["total_value"])
    assert last[1] == (3, 17.5)      # 2 events in b1 + 1 in b2 → state carried
    assert last[2] == (1, 1.0)
    assert last[3] == (1, 7.0)
    # user 1 emitted twice (once per batch) — proof of two micro-batches
    assert sum(1 for r in rows if r["user_id"] == 1) == 2


def test_streaming_ewma_matches_batch_operator(spark, tmp_path):
    """The stateful EWMA carried across two micro-batches equals the batch
    operator's final value over the concatenated history — state IS the
    recursion's (num, den)."""
    from hierarchical_graph_db_spark.operators.grouped import ewma_values
    from hierarchical_graph_db_spark.streaming.stateful import running_user_ewma

    mk = lambda i, u, v: Row(event_id=i, ts=dt.datetime(2024, 1, 1, 0, i),
                             user_id=u, event_type="click", value=v, props="{}")
    landing = tmp_path / "landing_ewma"
    landing.mkdir()
    batches = [
        [mk(1, 1, 10.0), mk(2, 1, 5.0), mk(3, 2, 1.0)],
        [mk(4, 1, 2.5), mk(5, 2, 7.0)],
    ]
    now = 1_700_000_000
    for i, rows in enumerate(batches):
        d = str(landing / f"b{i}")
        spark.createDataFrame(rows, FIXTURES["events"]).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i * 100, now + i * 100))

    stream = (
        spark.readStream.schema(FIXTURES["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing) + "/*")
    )
    q = (
        running_user_ewma(stream)
        .writeStream.format("memory").queryName("state_ewma")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_ewma"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    last = {}
    for r in spark.table("state_ewma").collect():
        last[r["user_id"]] = (r["n_events"], r["ewma"])

    # batch twin over the full history: last event's ewma per user
    all_rows = [r for b in batches for r in b]
    ev = spark.createDataFrame(all_rows, FIXTURES["events"])
    batch_final = {}
    got = ewma_values(ev, alpha=0.3).collect()
    by_eid = {r["event_id"]: r["ewma"] for r in got}
    batch_final[1] = by_eid[4]   # user 1's last event
    batch_final[2] = by_eid[5]   # user 2's last event
    assert last[1] == (3, batch_final[1])
    assert last[2] == (2, batch_final[2])
