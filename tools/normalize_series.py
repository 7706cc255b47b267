"""Cross-round calibration-normalized timing series (VERDICT r13 #1).

Reads timing artifacts — full bench outputs (``BENCH_r12_solo.json``),
driver bench wrappers (``BENCH_r{N}.json``, whose 2000-char ``tail`` holds
a front-truncated copy of the bench JSON line: per-query walls are parsed
by regex, so early-listed queries may be missing), and
``VERIFY_*_timings_*.json`` sweeps — extracts per-query raw walls plus
every embedded calibration, and prints a markdown table of raw and
normalized walls for the queries visible in ALL inputs.

Normalization is the prescribed single-thread formula
(``wall / (mean single_thread_sec / 0.19)``, see ``bench.host_factor``);
the supplementary parallel factor (``bench.host_factor_parallel``) is
printed per-artifact in the header because this box degrades by core
contention with near-healthy single-thread speed (r13: single 0.157 s,
speedup 14.5). CPU-bound normalization only — I/O-bound queries
normalize worse; a healthy-window raw measurement supersedes.

Usage: python tools/normalize_series.py BENCH_r12_solo.json BENCH_r13.json ...
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import host_factor, host_factor_parallel  # noqa: E402


def _floats(pattern: str, text: str) -> list[float]:
    return [float(x) for x in re.findall(pattern, text)]


def load_artifact(path: str) -> dict:
    """-> {label, queries: {name: wall}, singles: [..], parallels: [..],
    healthy, partial} for any of the three artifact shapes."""
    with open(path) as f:
        d = json.load(f)
    label = os.path.basename(path).replace(".json", "")
    if "tail" in d and "parsed" in d:  # driver wrapper, front-truncated
        tail = d["tail"]
        qs = {}
        # per-query walls: "name": 1.234 pairs inside the queries object —
        # stop collecting at "sf"/"calibration"-level keys by only taking
        # pairs before the first top-level metadata key we can anchor on.
        cut = len(tail)
        for anchor in ('"sf":', '"ingest_emails_per_sec":',
                       '"calibration":'):
            i = tail.find(anchor)
            if i != -1:
                cut = min(cut, i)
        for name, val in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)',
                                    tail[:cut]):
            qs[name] = float(val)
        singles = _floats(r'"single_thread_sec": ([0-9.]+)', tail)
        parallels = _floats(r'"parallel_wall_sec": ([0-9.]+)', tail)
        healthy = '"healthy": true' in tail
        return {"label": label, "queries": qs, "singles": singles,
                "parallels": parallels, "healthy": healthy, "partial": True}
    if "timings" in d:  # verify_local --timings-out
        cals = [d.get("calibration_at_end") or {},
                (d.get("health_at_start") or {}).get("calibration") or {}]
        return {"label": label, "queries": d["timings"],
                "singles": [c["single_thread_sec"] for c in cals
                            if c.get("single_thread_sec")],
                "parallels": [c["parallel_wall_sec"] for c in cals
                              if c.get("parallel_wall_sec")],
                "healthy": bool((d.get("health_at_start") or {})
                                .get("healthy")),
                "partial": False}
    # full bench output (solo runs)
    cals = [d.get("calibration") or {},
            (d.get("health_at_start") or {}).get("calibration") or {}]
    return {"label": label, "queries": d.get("queries", {}),
            "singles": [c["single_thread_sec"] for c in cals
                        if c.get("single_thread_sec")],
            "parallels": [c["parallel_wall_sec"] for c in cals
                          if c.get("parallel_wall_sec")],
            "healthy": bool((d.get("health_at_start") or {})
                            .get("healthy")),
            "partial": False}


def main(paths: list[str]) -> None:
    arts = [load_artifact(p) for p in paths]
    for a in arts:
        a["factor"] = host_factor(*a["singles"])
        a["factor_par"] = host_factor_parallel(*a["parallels"])
        flags = []
        if a["partial"]:
            flags.append("PARTIAL tail — early queries missing")
        if not a["healthy"]:
            flags.append("degraded host")
        print(f"# {a['label']}: host_factor={a['factor']} "
              f"(singles={a['singles']}), "
              f"host_factor_parallel={a['factor_par']} "
              f"(parallel_walls={a['parallels']})"
              + (f"  [{'; '.join(flags)}]" if flags else "  [healthy]"))
    shared = sorted(set.intersection(*[set(a["queries"]) for a in arts]))
    print(f"\n{len(shared)} queries visible in all "
          f"{len(arts)} artifacts\n")
    hdr = "| query |" + "".join(
        f" {a['label']} raw | norm |" for a in arts)
    print(hdr)
    print("|---" * (1 + 2 * len(arts)) + "|")
    tot_raw = [0.0] * len(arts)
    tot_norm = [0.0] * len(arts)
    for q in shared:
        cells = []
        for i, a in enumerate(arts):
            w = a["queries"][q]
            n = w / a["factor"]
            tot_raw[i] += w
            tot_norm[i] += n
            cells.append(f" {w:.2f} | {n:.2f} |")
        print(f"| {q} |" + "".join(cells))
    print(f"| **total ({len(shared)} shared)** |" + "".join(
        f" **{tot_raw[i]:.1f}** | **{tot_norm[i]:.1f}** |"
        for i in range(len(arts))))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
