"""Profile registry queries: wall time + per-Spark-job breakdown.

Usage: python tools/profile_query.py <sf_dir> <name> [name ...]

Runs each query once (collect(), same action as bench.py) after a shared
warmup, then prints each Spark job's duration/description/stage shape pulled
from the UI REST API — the guide §1 empirical loop without needing a live UI.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from hierarchical_graph_db_spark.queries import load
    from hierarchical_graph_db_spark.session import get_spark

    spark = get_spark("profile")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    registry = load()
    registry["point_lookup"].run(spark, sf_dir).collect()

    for name in names:
        jobs_before = {j["jobId"] for j in _rest(spark, "/jobs")}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        registry[name].run(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        jobs = [j for j in _rest(spark, "/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        total_job = 0.0
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (datetime.strptime(comp, fmt)
                       - datetime.strptime(sub, fmt)).total_seconds()
            except Exception:  # noqa: BLE001
                dur = float("nan")
            total_job += dur if dur == dur else 0.0
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(f"  job {j['jobId']:>4}  {dur:7.3f}s  tasks={j.get('numTasks', '?'):>4}  {desc}")
        print(f"  sum(job durations) = {total_job:.3f}s; gap (driver/plan) = {wall - total_job:.3f}s")


if __name__ == "__main__":
    main()
