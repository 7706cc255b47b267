"""Measure the capped-vs-complete crossover for the containment join
(VERDICT r11 next-round #4).

``containment_pairs`` keeps the N-complete ``"auto"`` df cutoff as its
oracle/baseline form, but HEAPS_r9 measured that cutoff running ~2x the
linear MinHash yardstick across the sf1->sf10 Heaps decade (the
``greatest(1000, N/100)`` cutoff re-admits Zipf-head shingles as N grows).
This probe measures BOTH regimes on each fixture dir and records the
``auto_cap`` decision statistic — the share of the inverted-index join
volume (sum df^2) carried by shingles with df > CONTAINMENT_CAP_DF, i.e.
exactly the volume the fixed cap removes — so the plan pick is grounded in
the same measured-crossover methodology as the prefix filter's
``plan="auto"`` (CROSSOVER_r11.json).

Unlike the prefix probe the two regimes do NOT emit identical rows (the cap
abstains on head-heavy pairs), so instead of a rows_agree bit this records
each regime's emitted pair count and the capped/complete recall ratio — the
trade the auto_cap docstring documents.

Usage:
    python tools/containment_crossover_probe.py DIR [DIR...] \
        [--threshold 0.7] [--reps 3] [--out FILE]
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
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hierarchical_graph_db_spark.io import Catalog
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        CONTAINMENT_CAP_DF,
        CONTAINMENT_CAP_MIN_SET,
        CONTAINMENT_CAP_SHARE,
        containment_pairs,
        shingles,
    )
    from hierarchical_graph_db_spark.session import get_spark

    spark = get_spark("containment-crossover-probe")
    results = []
    for d in args.dirs:
        docs = Catalog(spark, d).documents
        sh = shingles(docs)
        stats = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
            .agg(
                F.sum("df").alias("R"),
                F.count(F.lit(1)).alias("D"),
                F.sum(F.col("df") * F.col("df")).alias("V"),
                F.sum(F.when(F.col("df") > CONTAINMENT_CAP_DF,
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
            "cap_df": CONTAINMENT_CAP_DF,
            "hot_share": round(hot_share, 4),
            "auto_cap_picks": ("capped"
                               if hot_share > CONTAINMENT_CAP_SHARE
                               else "complete"),
            "plans": {},
        }
        plans = {
            "complete": lambda: containment_pairs(
                docs, threshold=args.threshold, max_shingle_freq="auto"),
            "capped": lambda: containment_pairs(
                docs, threshold=args.threshold,
                max_shingle_freq=CONTAINMENT_CAP_DF,
                min_set_size=CONTAINMENT_CAP_MIN_SET),
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
        comp = row["plans"]["complete"]["rows"]
        row["capped_recall_vs_complete"] = round(
            row["plans"]["capped"]["rows"] / comp, 4) if comp else None
        print(json.dumps(row))
        results.append(row)

    try:
        from bench import _calibrate

        cal = _calibrate()
    except Exception:
        cal = None
    payload = {"threshold": args.threshold,
               "cap_share_crossover": CONTAINMENT_CAP_SHARE,
               "results": results, "calibration": cal}
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps({"summary": [
        {"dir": r["dir"], "hot_share": r["hot_share"],
         "auto_cap_picks": r["auto_cap_picks"],
         "recall": r["capped_recall_vs_complete"],
         **{k: v["median_s"] for k, v in r["plans"].items()}}
        for r in results
    ]}))


if __name__ == "__main__":
    main()
