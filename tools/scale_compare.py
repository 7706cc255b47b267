"""Build the sf0.1 -> sf1 scaling table from two verify_local timings files.

Usage: python tools/scale_compare.py timings_sf01.json timings_sf1.json [--md]

The timings are Spark-only wall seconds per registry query (measured by
``tools/verify_local.py --timings-out`` before the DuckDB oracle runs, so
oracle cost never pollutes the engine's scaling signal). With a 10x data
decade between the two fixtures, a healthy distributed plan lands around
<=10x wall (linear in rows; often far below on a fixed 32-core host where
small-fixture runs are dominated by per-job fixed latency). The report
flags queries above a superlinearity threshold (default 15x, the VERDICT
r6 item-1 contract) for investigation.

Very small sub-second sf0.1 timings make ratios noisy (0.2 s -> 3 s is
"15x" but is really fixed-cost amortization); the flag list therefore only
includes queries whose sf1 time also exceeds --min-sec (default 10 s).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small", help="timings JSON at the smaller sf")
    ap.add_argument("large", help="timings JSON at the larger sf")
    ap.add_argument("--threshold", type=float, default=15.0,
                    help="flag queries scaling worse than this ratio")
    ap.add_argument("--min-sec", type=float, default=10.0,
                    help="only flag if the large-sf time also exceeds this")
    ap.add_argument("--md", action="store_true",
                    help="emit a Markdown table instead of plain text")
    args = ap.parse_args()

    small = json.load(open(args.small))
    large = json.load(open(args.large))
    ts, tl = small["timings"], large["timings"]
    shared = sorted(set(ts) & set(tl))
    rows = [(q, ts[q], tl[q], tl[q] / max(ts[q], 1e-3)) for q in shared]
    rows.sort(key=lambda r: -r[3])

    if args.md:
        print(f"| query | {small['sf_dir'].rsplit('/', 1)[-1]} s "
              f"| {large['sf_dir'].rsplit('/', 1)[-1]} s | ratio |")
        print("|---|---|---|---|")
        for q, a, b, r in rows:
            print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f}x |")
    else:
        print(f"{'query':42} {'small':>8} {'large':>8} {'ratio':>7}")
        for q, a, b, r in rows:
            print(f"{q:42} {a:8.2f} {b:8.2f} {r:6.1f}x")

    tot_s, tot_l = sum(ts[q] for q in shared), sum(tl[q] for q in shared)
    print(f"\nshared {len(shared)} queries: {tot_s:.0f}s -> {tot_l:.0f}s "
          f"({tot_l / tot_s:.1f}x total)")
    flagged = [(q, a, b, r) for q, a, b, r in rows
               if r > args.threshold and b > args.min_sec]
    if flagged:
        print(f"\nFLAGGED (> {args.threshold:.0f}x and > "
              f"{args.min_sec:.0f}s at the larger sf):")
        for q, a, b, r in flagged:
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
    else:
        print(f"\nno query scales worse than {args.threshold:.0f}x "
              f"(with sf1 time > {args.min_sec:.0f}s)")


if __name__ == "__main__":
    main()
