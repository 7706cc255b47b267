"""Demonstrate the relative rank grid in its TARGET regime (round 10).

The mass-conservation pytest (tests/test_graph.py) proves the truncation
mechanism at toy scale by coarsening the quantization factor. This probe
runs the REAL factors in the real regime: a synthetic graph with |V| above
the auto-switch threshold (1e7), where ``grid="auto"`` must pick the
relative grid, and per-vertex ranks (~1/|V| ≈ 6e-8) live close enough to
the absolute grid's 1e-15 resolution that hub contributions
``rank/out_degree`` start brushing the truncation floor.

Graph shape: |V| = 12M vertices in a ring (guaranteed no dangling mass, so
Σrank must equal 1 exactly up to grid error) PLUS one hub with out-edges
to ``hub_degree`` ring vertices — the hub's per-edge contribution is
``rank_hub/hub_degree`` ≈ 1/(1.2e7 · 4e6) ≈ 2e-14: representable on both
grids today, but only ~40 absolute quanta — at |V|·d just 50× larger the
absolute grid zeroes it while the relative grid keeps ~1e4 quanta of
headroom. The probe records Σrank and the auto-resolved factor for both
modes; conservation |Σ-1| ≤ 1e-6 in relative mode is the gate.

Usage: python tools/rank_grid_scale_probe.py [--n 12000000]
           [--hub-degree 4000000] [--iters 3] [--out RANKGRID_r10.json]
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
    ap.add_argument("--n", type=int, default=12_000_000)
    ap.add_argument("--hub-degree", type=int, default=4_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="RANKGRID_r10.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hierarchical_graph_db_spark.operators import graph as G
    from hierarchical_graph_db_spark.session import get_spark

    spark = get_spark("rank_grid_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    n, hd = args.n, args.hub_degree
    ring = spark.range(n).select(
        F.concat(F.lit("v"), F.col("id")).alias("src"),
        F.concat(F.lit("v"), (F.col("id") + 1) % n).alias("dst"))
    hub = spark.range(hd).select(
        F.lit("hub").alias("src"),
        F.concat(F.lit("v"), (F.col("id") * 3) % n).alias("dst"))
    edges = ring.unionByName(hub)

    results = {}
    for grid in ("auto", "absolute"):
        t0 = time.perf_counter()
        ranks = G.pagerank(edges, n_iter=args.iters, grid=grid)
        total = ranks.agg(F.sum("rank").alias("s")).first()["s"]
        wall = time.perf_counter() - t0
        results[grid] = {
            "sum_rank": total,
            "mass_error": abs(total - 1.0),
            "wall_sec": round(wall, 1),
            "resolved_fp": G._resolve_fp(n + 1, grid),
        }
        print(f"grid={grid}: sum={total:.12f} "
              f"err={abs(total - 1.0):.3e} wall={wall:.1f}s "
              f"fp={results[grid]['resolved_fp']:.3e}")

    doc = {"n_vertices": n + 1, "hub_degree": hd, "iters": args.iters,
           "auto_threshold": G._AUTO_GRID_MAX_N,
           "results": results,
           "auto_picked_relative":
               results["auto"]["resolved_fp"] != G._RANK_FP}
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")
    ok = (doc["auto_picked_relative"]
          and results["auto"]["mass_error"] <= 1e-6)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
