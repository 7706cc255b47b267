"""Compare two BENCH_r{N}.json files with host-speed normalization.

Usage: python tools/bench_compare.py BENCH_r05.json BENCH_r06.json

Wall-times are divided by the host's PARALLEL capacity ratio derived from
each file's ``calibration`` object (n_procs × single_thread_sec /
parallel_wall_sec — the right normalizer for Spark wall-times under
32-way load; single-thread speed alone overstates fast-host effects, see
PLANS.md "Bench environment note"). Files without a calibration object
(round ≤ 4) compare raw with a warning. Prints per-query raw and
normalized ratios (new/old; < 1 is faster), worst regressions first, plus
totals over the shared query set.
"""

from __future__ import annotations

import json
import re
import sys


def _load(path: str) -> dict:
    raw = json.load(open(path))
    if "queries" in raw:
        return raw
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
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
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
    rows = []
    for q in shared:
        o, n = old["queries"][q], new["queries"][q]
        rows.append((q, o, n, n / o, n * norm / o))
    rows.sort(key=lambda r: -r[4])
    print(f"{'query':42} {'old':>7} {'new':>7} {'raw':>6} {'norm':>6}")
    for q, o, n, raw, adj in rows:
        print(f"{q:42} {o:7.2f} {n:7.2f} {raw:6.2f} {adj:6.2f}")
    tot_o = sum(old["queries"][q] for q in shared)
    tot_n = sum(new["queries"][q] for q in shared)
    med = sorted(r[4] for r in rows)[len(rows) // 2]
    print(f"\nshared-set total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"(raw {tot_n / tot_o:.2f}x, normalized {tot_n * norm / tot_o:.2f}x); "
          f"median normalized per-query ratio {med:.2f}")


if __name__ == "__main__":
    main()
