"""Measure the prefix-filter vs inverted-index crossover for TRUE-Jaccard
set-similarity self-joins (VERDICT r10 next-round #1).

``dedup_prefix_filter_jaccard`` was the slowest sf1 registry query (40 s)
and 1.7x SLOWER than the plain inverted-index plan on the driver's
TPC-H-ish documents fixture, while being FASTER on the Heaps-Zipf corpus
(HEAPS_r9.json: 0.85x the MinHash yardstick). Both plans compute the same
result (true Jaccard >= t over full shingle sets; the PPJoin prefix filter
is lossless), so this is a physical-plan choice — this probe measures both
plans on both corpus shapes and records the candidate predictor statistics
a plan picker could compute cheaply from the shingle document-frequency
table:

* ``R``  = total shingle occurrence rows (sum df)
* ``D``  = distinct shingles
* ``V``  = sum df^2  — the inverted-index plan's matched-pair volume
           (exactly the rows its self-join emits before aggregation)
* ``maxdf``, ``p99df`` — head heaviness
* ``vr`` = V / R — the average number of join partners per occurrence row;
           the index plan's per-scan-row amplification factor

Usage:
    python tools/prefix_crossover_probe.py DIR [DIR...] \
        [--threshold 0.5] [--out FILE]

Writes one JSON object per fixture dir with stats + per-plan wall seconds
(median of --reps runs), plus the bench-style host calibration.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hierarchical_graph_db_spark.io import Catalog
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
        shingles,
    )
    from hierarchical_graph_db_spark.session import get_spark

    spark = get_spark("prefix-crossover-probe")
    results = []
    for d in args.dirs:
        docs = Catalog(spark, d).documents
        sh = shingles(docs)
        from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
            PREFIX_PLAN_HOT_DF,
            PREFIX_PLAN_HOT_SHARE,
        )

        hot = PREFIX_PLAN_HOT_DF
        stats = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
            .agg(
                F.sum("df").alias("R"),
                F.count(F.lit(1)).alias("D"),
                F.sum(F.col("df") * F.col("df")).alias("V"),
                F.sum(F.when(F.col("df") > hot,
                             F.col("df") * F.col("df"))
                      .otherwise(0)).alias("hotV"),
                F.max("df").alias("maxdf"),
                F.percentile_approx("df", 0.99).alias("p99df"),
            )
            .first()
        )
        hot_share = stats["hotV"] / max(stats["V"], 1)
        row = {
            "dir": d,
            "n_docs": docs.count(),
            "R": stats["R"], "D": stats["D"], "V": stats["V"],
            "maxdf": stats["maxdf"], "p99df": stats["p99df"],
            "vr": stats["V"] / max(stats["R"], 1),
            # the plan="auto" decision statistic (PLANS.md §Round-11):
            # fraction of index-join volume carried by df > hot shingles
            "hot_df": hot,
            "hot_share": round(hot_share, 4),
            "auto_picks": ("prefix" if hot_share > PREFIX_PLAN_HOT_SHARE
                           else "index"),
            "plans": {},
        }
        plans = {
            "prefix": lambda: prefix_filter_jaccard_pairs(
                docs, threshold=args.threshold, n=3, plan="prefix"),
            "index": lambda: ngram_jaccard_pairs(
                docs, threshold=args.threshold, n=3,
                max_shingle_freq=None),
        }
        for name, build in plans.items():
            walls, n_rows = [], None
            for _ in range(args.reps):
                t0 = time.monotonic()
                n_rows = build().count()
                walls.append(round(time.monotonic() - t0, 2))
            row["plans"][name] = {
                "rows": n_rows,
                "walls": walls,
                "median_s": statistics.median(walls),
            }
        rows_seen = {p["rows"] for p in row["plans"].values()}
        row["rows_agree"] = len(rows_seen) == 1
        print(json.dumps(row))
        results.append(row)

    try:
        from bench import calibration  # type: ignore

        cal = calibration()
    except Exception:
        cal = None
    payload = {"threshold": args.threshold, "results": results,
               "calibration": cal}
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps({"summary": [
        {"dir": r["dir"], "hot_share": r["hot_share"],
         "auto_picks": r["auto_picks"],
         **{k: v["median_s"] for k, v in r["plans"].items()}}
        for r in results
    ]}))


if __name__ == "__main__":
    main()
