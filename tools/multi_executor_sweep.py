"""Multi-executor equivalence sweep (VERDICT r7 next-round item 1).

Runs registry queries under a caller-chosen Spark master and prints ONE JSON
line ``{"master": ..., "checkpoint_dir": ..., "results": {name: {"rows": N,
"hash": sha256}}}`` using the exact canonicalization of the oracle sweep
(``tools/result_digest.py``).

The point: every number the engine has ever produced came from ``local[N]``
(one JVM).  ``local-cluster[E,C,MB]`` launches E *separate executor JVMs* —
real serialization boundaries, real remote shuffle fetches, real
executor-side Python workers — the closest a single box gets to a cluster.
Running the iterative family (PageRank, CC, k-truss, betweenness, k-means,
LR, BPE, CDC replay) there with ``SPARK_GRAFT_CHECKPOINT_DIR`` set exercises
the durable ``checkpoint()`` branch of ``materialize()`` (lineage-safe under
executor loss) and the hash comparison proves the plans are
partitioning-deterministic across execution modes.

Usage:
    python tools/multi_executor_sweep.py SF_DIR OUT.json [query ...] \
        [--master local-cluster[2,2,2048]] [--checkpoint-dir DIR]

Compare two runs:
    python tools/multi_executor_sweep.py sf0.01 a.json q1 q2
    python tools/multi_executor_sweep.py sf0.01 b.json q1 q2 \
        --master 'local-cluster[2,2,2048]' --checkpoint-dir /tmp/ck
    python - <<'PY'
    import json; a=json.load(open('a.json')); b=json.load(open('b.json'))
    strip = lambda rs: {n: {k: v for k, v in r.items() if k != 'secs'}
                        for n, r in rs.items()}
    assert strip(a['results']) == strip(b['results'])
    PY
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from result_digest import frame_digest  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--master", default=None,
                    help="Spark master (default: engine local[N])")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="durable checkpoint dir → materialize() uses "
                         "checkpoint() instead of localCheckpoint()")
    args = ap.parse_args()

    if args.master:
        os.environ["SPARK_MASTER"] = args.master
    if args.checkpoint_dir:
        os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = args.checkpoint_dir

    from hierarchical_graph_db_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("multi-executor-sweep")
    qs = entry_mod.queries()
    results: dict[str, dict] = {}
    for name in args.names:
        t0 = time.time()
        df = qs[name](spark, args.sf_dir)
        rows = df.collect()
        cols = df.columns
        results[name] = {
            "rows": len(rows),
            "hash": frame_digest(cols, [tuple(r) for r in rows]),
            # Wall seconds; excluded from equivalence comparison (compare
            # the "results" dicts with timings stripped, or per-name
            # rows/hash) — recorded so mode-vs-mode overhead (serialization,
            # remote shuffle fetch, durable checkpoints) gets a number.
            "secs": round(time.time() - t0, 2),
        }
        print(f"done {name}: {len(rows)} rows, {time.time()-t0:.1f}s",
              file=sys.stderr)
    out = {
        "master": spark.sparkContext.master,
        "checkpoint_dir": spark.sparkContext.getCheckpointDir(),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"master": out["master"], "n": len(results)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
