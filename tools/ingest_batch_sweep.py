"""Arrow batch-size sensitivity sweep for the email-parse hot path
(VERDICT r9 next-round #5).

`parse_emails` (sources/maildir.py, one `mapInPandas` over raw RFC822
bytes) is the engine's ONLY Python-heavy hot path; everything else is
JVM-side. Its throughput constant is what a 100 TB ingest estimate
multiplies by, so this sweep measures messages/sec against
``spark.sql.execution.arrow.maxRecordsPerBatch`` (the Arrow transfer
batch size — per-batch Python overhead amortization vs. peak memory and
pipelining granularity across the 32 workers).

Method: sf1-sized synthetic email corpus (the sf0.1 documents replicated
``--replicate`` times with distinct filenames so dedup-merge work is
realistic), one warmup + ``--reps`` timed runs per batch size, MIN wall
reported (min is the right statistic under co-tenant noise — see
BENCH_variance_r9.json), single-thread calibration probe embedded.

Usage: python tools/ingest_batch_sweep.py [sf_dir]
           [--sizes 1000,2000,5000,10000,20000,50000]
           [--reps 3] [--replicate 5] [--out INGEST_SWEEP_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--sizes", default="1000,2000,5000,10000,20000,50000")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--replicate", type=int, default=5)
    ap.add_argument("--out", default="INGEST_SWEEP_r10.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from hierarchical_graph_db_spark.queries.emailq import _synthetic_emails
    from hierarchical_graph_db_spark.session import get_spark
    from hierarchical_graph_db_spark.sources.maildir import (
        merge_parsed,
        parse_emails,
    )

    spark = get_spark("ingest_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    base = _synthetic_emails(spark, args.sf_dir)
    # replicate with distinct filenames/users so the merge stage sees
    # realistic key cardinality, then PIN the input so the sweep times the
    # parse+merge only, not the synthesis scan
    emails = None
    for i in range(args.replicate):
        rep = base.withColumn(
            "filename", F.concat_ws("_", "filename", F.lit(str(i))))
        emails = rep if emails is None else emails.unionByName(rep)
    emails = emails.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    emails.persist()
    n = emails.count()

    results = []
    for size in sizes:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(size))
        walls = []
        for rep in range(args.reps + 1):  # rep 0 = warmup
            t0 = time.perf_counter()
            merge_parsed(parse_emails(emails)).count()
            wall = time.perf_counter() - t0
            if rep > 0:
                walls.append(wall)
        best = min(walls)
        results.append({
            "max_records_per_batch": size,
            "walls_sec": [round(w, 3) for w in walls],
            "best_sec": round(best, 3),
            "emails_per_sec": round(n / best, 1),
        })
        print(f"batch={size:>6}  best={best:6.2f}s  "
              f"{n / best:9.1f} emails/s  (all: "
              f"{', '.join(f'{w:.2f}' for w in walls)})")
    emails.unpersist()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    doc = {
        "sf_dir": args.sf_dir,
        "n_emails": n,
        "n_cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "reps": args.reps,
        "results": results,
        "calibration_at_end": bench._calibrate(),
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    best = max(results, key=lambda r: r["emails_per_sec"])
    per_core = best["emails_per_sec"] / doc["n_cpus"]
    print(f"best: batch={best['max_records_per_batch']} "
          f"{best['emails_per_sec']} emails/s "
          f"({per_core:.1f}/s/core); wrote {args.out}")


if __name__ == "__main__":
    main()
