"""SCC distributed-path scale evidence (VERDICT r11 next-round #2).

The registry SCC trio runs on the top-300-user strong-tie sparsification —
UNDER the 4096-vertex hybrid driver-finish cutoff, so every driver-green
row exercises the driver Tarjan kernel, never the FW-BW-MIN coloring. This
probe gives the DISTRIBUTED path the same evidence class as the rank
loops (MULTIEXEC_r11): it builds the top-10k-user strong-tie interaction
graph at sf0.1 (|V| ≈ 10k, ABOVE the cutoff, with the realistic mix of
giant SCCs + chain/singleton periphery that makes the hybrid finish
engage), runs ``strongly_connected_components`` under BOTH
``small_cutoff=4096`` (hybrid: FW-BW rounds, then driver Tarjan on the
bounded remainder) and ``small_cutoff=0`` (pure distributed coloring to
the last vertex), under BOTH ``local[*]`` and ``local-cluster[2,4,4096]``
(separate executor JVMs, durable checkpoints), and asserts the four
(id, scc) row sets are sha256-identical. Timing rows record what the
hybrid finish buys.

Usage:
    python tools/scc_scale_probe.py [sf_dir] [--top-k 10000] \
        [--out SCC_SCALE_r12.json]
    # internal single-run mode (spawned per master/cutoff combo):
    python tools/scc_scale_probe.py SF_DIR --single OUT.json \
        --small-cutoff N [--master M] [--checkpoint-dir D]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(TOOLS)
sys.path.insert(0, ROOT)
sys.path.insert(0, TOOLS)


def build_edges(spark, sf_dir: str, top_k: int):
    """Top-``top_k``-active-user, top-2-out-edge strong-tie sparsification —
    the registry ``_strong_tie_edges`` shape (queries/graphq.py) widened
    from 300 to 10k users so |V| clears the hybrid cutoff."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hierarchical_graph_db_spark.io import Catalog
    from hierarchical_graph_db_spark.operators.graph import (
        sequential_interaction_edges,
    )

    ev = Catalog(spark, sf_dir).events
    tops = (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
            .orderBy(F.col("n_ev").desc(), F.col("user_id")).limit(top_k)
            .select("user_id"))
    w = (
        sequential_interaction_edges(ev)
        .join(F.broadcast(tops.withColumnRenamed("user_id", "src")), "src")
        .join(F.broadcast(tops.withColumnRenamed("user_id", "dst")), "dst")
        .groupBy(F.col("src").cast("string").alias("s"),
                 F.col("dst").cast("string").alias("d"))
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    win = Window.partitionBy("s").orderBy(F.col("wt").desc(), F.col("d"))
    return (w.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") <= 2)
            .select(F.col("s").alias("src"), F.col("d").alias("dst")))


def single(args) -> int:
    if args.master:
        os.environ["SPARK_MASTER"] = args.master
    if args.checkpoint_dir:
        os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = args.checkpoint_dir

    from result_digest import frame_digest

    from hierarchical_graph_db_spark.materialize import materialize
    from hierarchical_graph_db_spark.operators.graph import (
        strongly_connected_components,
    )
    from hierarchical_graph_db_spark.session import get_spark

    spark = get_spark("scc-scale-probe")
    edges = build_edges(spark, args.sf_dir, args.top_k).transform(materialize)
    n_edges = edges.count()
    n_vertices = (edges.select("src").union(edges.select("dst"))
                  .distinct().count())
    t0 = time.time()
    out = strongly_connected_components(edges,
                                        small_cutoff=args.small_cutoff)
    rows = [tuple(r) for r in out.collect()]
    secs = round(time.time() - t0, 2)
    doc = {
        "master": spark.sparkContext.master,
        "small_cutoff": args.small_cutoff,
        "n_vertices": n_vertices,
        "n_edges": n_edges,
        "rows": len(rows),
        "n_sccs": len({r[1] for r in rows}),
        "hash": frame_digest(["id", "scc"], rows),
        "secs": secs,
    }
    with open(args.single, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({k: doc[k] for k in
                      ("master", "small_cutoff", "rows", "secs")}))
    spark.stop()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--top-k", type=int, default=10000)
    ap.add_argument("--out", default="SCC_SCALE_r12.json")
    ap.add_argument("--single", default=None)
    ap.add_argument("--small-cutoff", type=int, default=4096)
    ap.add_argument("--master", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()
    if args.single:
        return single(args)

    wd = tempfile.mkdtemp(prefix="hgdb_scc_scale_")
    combos = {
        "local_hybrid": (None, 4096, None),
        "local_distributed": (None, 0, None),
        "cluster_hybrid": ("local-cluster[2,4,4096]", 4096,
                           os.path.join(wd, "ck_h")),
        "cluster_distributed": ("local-cluster[2,4,4096]", 0,
                                os.path.join(wd, "ck_d")),
    }
    runs: dict[str, dict] = {}
    for name, (master, cutoff, ck) in combos.items():
        out = os.path.join(wd, f"{name}.json")
        cmd = [sys.executable, os.path.abspath(__file__), args.sf_dir,
               "--single", out, "--small-cutoff", str(cutoff),
               "--top-k", str(args.top_k)]
        if master:
            cmd += ["--master", master]
        if ck:
            cmd += ["--checkpoint-dir", ck]
        subprocess.run(cmd, check=True, cwd=ROOT)
        with open(out) as fh:
            runs[name] = json.load(fh)

    hashes = {k: v["hash"] for k, v in runs.items()}
    identical = len(set(hashes.values())) == 1
    doc = {
        "note": ("strongly_connected_components on the top-10k-user "
                 "strong-tie graph (ABOVE the 4096 hybrid cutoff): hybrid "
                 "(FW-BW rounds + driver Tarjan on the bounded remainder) "
                 "vs small_cutoff=0 (pure distributed FW-BW-MIN to the "
                 "last vertex), each under local[*] AND "
                 "local-cluster[2,4,4096] (separate executor JVMs, durable "
                 "checkpoints). SCC with min-member labels is "
                 "algorithm-independent, so all four row sets must be "
                 "sha256-identical — this is the at-scale evidence the "
                 "registry trio (top-300 graph, driver-kernel-only) "
                 "cannot give the distributed path."),
        "sf_dir": args.sf_dir,
        "top_k": args.top_k,
        "n_vertices": runs["local_hybrid"]["n_vertices"],
        "n_edges": runs["local_hybrid"]["n_edges"],
        "n_sccs": runs["local_hybrid"]["n_sccs"],
        "rows": runs["local_hybrid"]["rows"],
        "all_hashes_identical": identical,
        "hash": runs["local_hybrid"]["hash"],
        "hashes": hashes,
        "secs": {k: v["secs"] for k, v in runs.items()},
    }
    with open(os.path.join(ROOT, args.out), "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({"all_hashes_identical": identical,
                      "n_vertices": doc["n_vertices"],
                      "secs": doc["secs"]}))
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
