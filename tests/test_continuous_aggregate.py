"""Continuous aggregate: the incrementally-maintained rollup store must equal
the batch rollup over all data, and replays must not double-count."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.sessionize import tumbling_rollup
from hierarchical_graph_db_spark.schemas import FIXTURES
from hierarchical_graph_db_spark.streaming.continuous_aggregate import (
    ContinuousRollupSink,
    read_rollup,
)
from hierarchical_graph_db_spark.streaming.ingest import run_available_now


def test_continuous_rollup_matches_batch(spark, tmp_path):
    mk = lambda i, h, m, t, v: Row(
        event_id=i, ts=dt.datetime(2024, 1, 1, h, m), user_id=1,
        event_type=t, value=v, props="{}")
    batches = [
        [mk(1, 9, 5, "click", 1.5), mk(2, 9, 40, "view", 2.0)],
        [mk(3, 9, 50, "click", 3.25), mk(4, 11, 0, "click", 4.0)],
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    now = 1_700_000_000
    all_rows = []
    for i, rows in enumerate(batches):
        all_rows += rows
        d = str(landing / f"b{i}")
        spark.createDataFrame(rows, FIXTURES["events"]).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i * 100, now + i * 100))

    store = str(tmp_path / "rollup_store")
    sink = ContinuousRollupSink(spark, store, minutes=60)
    stream = (
        spark.readStream.schema(FIXTURES["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing) + "/*")
    )
    run_available_now(stream, sink, str(tmp_path / "cp"))

    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
           for r in read_rollup(spark, store).collect()}
    # batch twin over ALL the data
    batch_df = spark.createDataFrame(all_rows, FIXTURES["events"])
    want = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in tumbling_rollup(batch_df, "hour").collect()}
    assert got == want
    # two-batch increment actually merged (9:00 click bucket spans batches)
    assert got[(dt.datetime(2024, 1, 1, 9), "click")] == (2, 4.75)

    # replaying an old batch is a no-op (exactly-once guard)
    sink(spark.createDataFrame(batches[0], FIXTURES["events"]), batch_id=0)
    again = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
             for r in read_rollup(spark, store).collect()}
    assert again == want
