"""Measure streaming state-store bounds across micro-batches (VERDICT r9 #4).

The §2.8 boundedness claims — watermarked dedup and interval-join state
evicted at the horizon, windowed-agg state ≈ open windows, HLL/CMS state ≤
groups×m rows — were argued from construction. This harness MEASURES them:
the events fixture is split into N time-ordered parquet chunks in a landing
dir, each stateful query is driven over it with ``maxFilesPerTrigger=1``
under ``Trigger.AvailableNow`` (one chunk per micro-batch, so the watermark
advances between batches exactly as in a live stream), and every batch's
``StreamingQueryProgress.stateOperators`` (numRowsTotal, memoryUsedBytes)
is recorded.

What "bounded" means per probe (asserted in tests/test_streaming_state.py):

* ``wm_dedup_unique`` — dropDuplicatesWithinWatermark keyed on
  (user_id, event_type, ts): every row is a distinct key, so WITHOUT
  eviction state would equal cumulative input (the reference's
  forever-growing Mongo unique index); WITH the 2h watermark, end-of-batch
  state is only the keys newer than the horizon — flat, a small fraction
  of cumulative rows.
* ``interval_join`` — purchases ⋈ clicks within 10 min: both sides buffer
  only rows inside watermark+band once the watermark moves.
* ``tumbling_append`` — 60-min windows, APPEND mode: closed windows leave
  the store; state ≈ windows still open at the horizon. (The registry's
  ``streaming_tumbling_rollup`` drains in complete mode for the oracle —
  complete mode retains all windows by design, so the eviction claim is
  measured here on the append twin.)
* ``hll_registers`` — state is the register table itself: ≤ groups × m
  rows NO MATTER how long the stream runs (5 event types × 1024 = 5120).
* ``cms_grid`` — ≤ depth × width = 4 × 64 = 256 rows.

Usage: python tools/streaming_state_probe.py [sf_dir] [--batches 12]
           [--out STREAMING_STATE_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_landing(spark: SparkSession, sf_dir: str, out_dir: str,
                  n_chunks: int) -> str:
    """Split the events fixture into ``n_chunks`` time-ordered single-file
    parquet chunks under ``out_dir`` — chunk i strictly precedes chunk i+1
    in event time, and file mtimes are forced increasing so the file source
    replays them in order (one per micro-batch with maxFilesPerTrigger=1)."""
    from hierarchical_graph_db_spark.io import Catalog

    os.makedirs(out_dir, exist_ok=True)
    # single-partition global window: fine for a probe tool at fixture scale
    ev = Catalog(spark, sf_dir).events.withColumn(
        "_chunk", F.ntile(n_chunks).over(Window.orderBy("ts")))
    ev.persist()
    try:
        for i in range(1, n_chunks + 1):
            tmp = os.path.join(out_dir, f"_tmp_{i}")
            (ev.where(F.col("_chunk") == i).drop("_chunk")
             .coalesce(1).write.mode("overwrite").parquet(tmp))
            part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            dst = os.path.join(out_dir, f"chunk_{i:03d}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            shutil.rmtree(tmp)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    finally:
        ev.unpersist()
    return out_dir


def _chunk_stream(spark: SparkSession, landing: str) -> DataFrame:
    schema = spark.read.parquet(landing).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )


def probe(stream_df: DataFrame, output_mode: str) -> list[dict]:
    """Drain under AvailableNow into a memory sink and return one record per
    micro-batch: input rows + per-operator state rows/bytes."""
    name = "state_probe_" + uuid.uuid4().hex[:12]
    cp = tempfile.mkdtemp(prefix="hgdb_state_probe_cp_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0 and not p.get("stateOperators"):
            continue
        out.append({
            "batch": p["batchId"],
            "input_rows": p["numInputRows"],
            "state": [
                {
                    "op": s.get("operatorName", "?"),
                    "rows": s["numRowsTotal"],
                    "mem_bytes": s["memoryUsedBytes"],
                }
                for s in p.get("stateOperators", [])
            ],
        })
    shutil.rmtree(cp, ignore_errors=True)
    return out


# ---------------------------------------------------------------- probes

def p_wm_dedup_unique(spark: SparkSession, landing: str):
    from hierarchical_graph_db_spark.streaming.streams import (
        dedup_within_watermark,
    )

    return dedup_within_watermark(
        _chunk_stream(spark, landing), ["user_id", "event_type", "ts"],
        watermark="2 hours"), "append"


def p_interval_join(spark: SparkSession, landing: str):
    from hierarchical_graph_db_spark.streaming.streams import interval_join

    ev = _chunk_stream(spark, landing)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    ev2 = _chunk_stream(spark, landing)
    clicks = ev2.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value")
    return interval_join(purchases, clicks, on="user_id",
                         left_cols=["value"], right_cols=["value"],
                         watermark="2 hours"), "append"


def p_tumbling_append(spark: SparkSession, landing: str):
    from hierarchical_graph_db_spark.streaming.windows import tumbling_counts

    return tumbling_counts(_chunk_stream(spark, landing), minutes=60,
                           watermark="2 hours"), "append"


def p_hll_registers(spark: SparkSession, landing: str):
    from hierarchical_graph_db_spark.operators.sketches import hll_registers

    return hll_registers(_chunk_stream(spark, landing), "user_id",
                         ["event_type"], m=1024), "complete"


def p_cms_grid(spark: SparkSession, landing: str):
    from hierarchical_graph_db_spark.operators.sketches import cms_build

    return cms_build(
        _chunk_stream(spark, landing).select(
            F.col("user_id").cast("string").alias("item")),
        "item", width=64, depth=4), "complete"


PROBES = {
    "wm_dedup_unique": p_wm_dedup_unique,
    "interval_join": p_interval_join,
    "tumbling_append": p_tumbling_append,
    "hll_registers": p_hll_registers,
    "cms_grid": p_cms_grid,
}


def run_all(spark: SparkSession, sf_dir: str, workdir: str,
            n_chunks: int) -> dict:
    landing = build_landing(spark, sf_dir,
                            os.path.join(workdir, "landing"), n_chunks)
    results = {}
    for name, fn in PROBES.items():
        df, mode = fn(spark, landing)
        batches = probe(df, mode)
        rows = [max((s["rows"] for s in b["state"]), default=0)
                for b in batches]
        results[name] = {
            "batches": batches,
            "n_batches": len(batches),
            "cumulative_input_rows": sum(b["input_rows"] for b in batches),
            "max_state_rows": max(rows, default=0),
            "final_state_rows": rows[-1] if rows else 0,
        }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--out", default="STREAMING_STATE_r10.json")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("streaming_state_probe")
        # few shuffle partitions: state stores are per-partition; the probe
        # measures row/byte bounds, not parallel throughput
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    workdir = tempfile.mkdtemp(prefix="hgdb_state_probe_")
    try:
        results = run_all(spark, args.sf_dir, workdir, args.batches)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    doc = {"sf_dir": args.sf_dir, "n_chunks": args.batches,
           "probes": results}
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    for name, r in results.items():
        print(f"{name}: batches={r['n_batches']} "
              f"cum_input={r['cumulative_input_rows']} "
              f"max_state={r['max_state_rows']} "
              f"final_state={r['final_state_rows']}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
