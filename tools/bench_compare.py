"""Compare two BENCH_r{N}.json files with host-speed normalization.

Usage: python tools/bench_compare.py BENCH_r05.json BENCH_r06.json
       python tools/bench_compare.py r8 r9            # round shorthand
       python tools/bench_compare.py r8 r9 --yardstick dedup_minhash_lsh

Three ratios per query (new/old; < 1 is faster):

* ``raw`` — wall-time ratio. On this shared VM, meaningless below ~1.5×
  (two back-to-back solo runs of identical code differed +43.8% total,
  per-query up to 6.2× — BENCH_variance_r9.json).
* ``norm`` — wall-times normalized by each run's PARALLEL capacity
  derived from its embedded ``calibration`` object (n_procs ×
  single_thread_sec / parallel_wall_sec — the right normalizer for Spark
  wall under 32-way load; single-thread speed alone overstates fast-host
  effects, see PLANS.md "Bench environment note"). Files without a
  calibration object (round ≤ 4) compare raw with a warning.
* ``yard`` — SAME-RUN yardstick ratio: each query's time divided by the
  same run's yardstick query (default ``dedup_minhash_lsh``, a proven-
  linear shuffle-shaped reference), then new/old of those. Host mood —
  even mood that shifted BETWEEN the calibration probe and a given
  query — cancels, because numerator and denominator rode the same
  process, JVM, and co-tenant weather. The most drift-immune column;
  trust it over ``norm`` when they disagree (VERDICT r9 next-round #6).
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _resolve(arg: str) -> Path:
    m = re.fullmatch(r"r(\d+)", arg)
    if m:
        return _REPO / f"BENCH_r{int(m.group(1)):02d}.json"
    return Path(arg)


def _load(path: Path) -> dict:
    raw = json.load(open(path))
    if "queries" in raw:
        return raw
    if isinstance(raw.get("parsed"), dict) and "queries" in raw["parsed"]:
        return raw["parsed"]
    # driver-recorded files wrap the JSON line in a "tail" transcript
    tail = raw.get("tail", "")
    m = re.search(r'\{"metric".*\}', tail.replace('\\"', '"'))
    if not m:
        raise SystemExit(f"{path}: no bench JSON found")
    return json.loads(m.group(0))


def _capacity(bench: dict) -> float | None:
    c = bench.get("calibration")
    if not c:
        return None
    return c["n_procs"] * c["single_thread_sec"] / c["parallel_wall_sec"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--yardstick", default="dedup_minhash_lsh",
                    help="same-run reference query for the drift-cancelling "
                         "column (must appear in both files)")
    args = ap.parse_args()
    old, new = _load(_resolve(args.old)), _load(_resolve(args.new))
    cap_o, cap_n = _capacity(old), _capacity(new)
    if cap_o and cap_n:
        # normalized time = wall * capacity (work units); ratio of work
        norm = cap_n / cap_o
        print(f"host parallel-capacity ratio new/old: {norm:.3f} "
              f"(normalizing new wall-times by x{norm:.3f})")
    else:
        norm = 1.0
        print("WARNING: calibration missing in one file — raw comparison")
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    y = args.yardstick
    y_o = old["queries"].get(y)
    y_n = new["queries"].get(y)
    if y_o and y_n:
        print(f"yardstick {y}: {y_o:.2f}s -> {y_n:.2f}s "
              f"(yard column = per-query ratio with this divided out)")
    else:
        print(f"WARNING: yardstick {y!r} missing — yard column omitted")
    rows = []
    for q in shared:
        o, n = old["queries"][q], new["queries"][q]
        yard = (n / y_n) / (o / y_o) if (y_o and y_n and o) else float("nan")
        rows.append((q, o, n, n / o, n * norm / o, yard))
    rows.sort(key=lambda r: -r[4])
    print(f"{'query':42} {'old':>7} {'new':>7} {'raw':>6} {'norm':>6} {'yard':>6}")
    for q, o, n, raw, adj, yard in rows:
        print(f"{q:42} {o:7.2f} {n:7.2f} {raw:6.2f} {adj:6.2f} {yard:6.2f}")
    tot_o = sum(old["queries"][q] for q in shared)
    tot_n = sum(new["queries"][q] for q in shared)
    med = sorted(r[4] for r in rows)[len(rows) // 2]
    line = (f"\nshared-set total: {tot_o:.1f}s -> {tot_n:.1f}s "
            f"(raw {tot_n / tot_o:.2f}x, normalized "
            f"{tot_n * norm / tot_o:.2f}x); "
            f"median normalized per-query ratio {med:.2f}")
    if y_o and y_n:
        med_y = sorted(r[5] for r in rows)[len(rows) // 2]
        line += f"; median yardstick ratio {med_y:.2f}"
    print(line)


if __name__ == "__main__":
    main()
