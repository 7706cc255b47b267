"""Continuous aggregate (hypertable-rollup style): a time-bucketed rollup
store maintained incrementally from a stream.

TimescaleDB's continuous aggregates / materialized rollups, Spark-native:
each micro-batch computes its *partial* (window, key) aggregates — counts
and sums, the decomposable kind — and merges them into a parquet rollup
store by key addition. Querying the store costs O(|buckets|), never a
rescan of raw events; the merge touches only buckets present in the batch.

Exactly-once: the merge is NOT naturally idempotent (counts would double on
replay), so the sink records the last merged ``batch_id`` inside the store
directory and skips replays — the standard transactional-sink pattern for
foreachBatch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partial_rollup(batch: DataFrame, minutes: int = 60) -> DataFrame:
    """Per-batch partials: (window_start, event_type) → count/sum."""
    return (
        batch.groupBy(
            F.window(F.col("ts"), f"{minutes} minutes")["start"].alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


class ContinuousRollupSink:
    """foreachBatch body merging batch partials into the rollup store."""

    def __init__(self, spark: SparkSession, store_path: str, minutes: int = 60):
        self.spark = spark
        self.store_path = store_path
        self.minutes = minutes

    @property
    def _marker(self) -> str:
        return os.path.join(self.store_path + "_meta", "last_batch.json")

    def _last_batch(self) -> int:
        try:
            with open(self._marker, encoding="utf-8") as f:
                return json.load(f)["batch_id"]
        except (OSError, ValueError):
            return -1

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_batch():
            return  # replayed batch: already merged, skip (exactly-once)
        partial = partial_rollup(batch, self.minutes)
        if os.path.isdir(self.store_path):
            current = self.spark.read.parquet(self.store_path)
            merged = (
                current.unionByName(partial)
                .groupBy("window_start", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").alias("sum_value"),
                )
            )
            rows = merged.collect()  # materialize before overwriting input
            merged = self.spark.createDataFrame(rows, merged.schema)
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(self.store_path)
        os.makedirs(os.path.dirname(self._marker), exist_ok=True)
        with open(self._marker, "w", encoding="utf-8") as f:
            json.dump({"batch_id": batch_id}, f)


def read_rollup(spark: SparkSession, store_path: str) -> DataFrame:
    """The query side: rounded, ready-to-serve bucket aggregates."""
    return spark.read.parquet(store_path).select(
        "window_start",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 2).alias("total_value"),
    )
