"""PLANS.md's round-over-round bench headline numbers must be derived from
the COMMITTED BENCH_r{N}.json artifacts of record, not from ad-hoc mid-round
runs (round-6 verdict "what's wrong" item 1). This test recomputes the
shared-set totals and the flagged per-query numbers from the committed files
exactly as tools/bench_compare.py does, and asserts the strings PLANS.md
cites match."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from bench_compare import _load  # noqa: E402  (handles driver-wrapped files)


def _bench(name: str) -> dict:
    return _load(os.path.join(ROOT, name))


def test_round6_accounting_matches_committed_artifacts():
    old, new = _bench("BENCH_r05.json"), _bench("BENCH_r06.json")
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    tot_o = sum(old["queries"][q] for q in shared)
    tot_n = sum(new["queries"][q] for q in shared)
    plans = open(os.path.join(ROOT, "PLANS.md")).read()
    want_total = f"{tot_o:.1f} → {tot_n:.1f} s RAW ({tot_n / tot_o:.2f}×)"
    assert want_total in plans, (
        f"PLANS.md round-6 accounting must cite the committed artifacts: "
        f"expected '{want_total}'")
    ivf = (f"{old['queries']['ann_ivf_topk']:.2f} → "
           f"{new['queries']['ann_ivf_topk']:.2f} s raw")
    assert ivf in plans, f"expected '{ivf}' in PLANS.md"

    def cap(b):
        c = b["calibration"]
        return c["n_procs"] * c["single_thread_sec"] / c["parallel_wall_sec"]

    norm = cap(new) / cap(old)
    assert f"{tot_n * norm / tot_o:.2f}× calibration-NORMALIZED" in plans
