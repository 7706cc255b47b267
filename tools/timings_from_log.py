"""Recover a verify_local timings JSON from its console log.

Usage: python tools/timings_from_log.py sweep.log sf_dir > timings.json

``tools/verify_local.py --timings-out`` writes its JSON only when the full
sweep completes; for multi-hour large-sf sweeps this rebuilds the same
artifact from the progressively-written PASS/ok? lines (which carry the
Spark-only wall seconds), so a crash or an early stop loses nothing.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log_path, sf_dir = sys.argv[1], sys.argv[2]
    txt = open(log_path).read().replace("\r", "\n")
    # "PASS  name (N rows, 1.2s)"  /  "ok?   name: rows-only (N rows, 1.2s)"
    timings = {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r"^(?:PASS|ok\?)\s+(\w+):?[^\n]*?\(\d+ rows, ([0-9.]+)s\)",
            txt, re.M)
    }
    failures = re.findall(r"^FAIL\s+(\w+):", txt, re.M)
    json.dump({"sf_dir": sf_dir, "timings": timings, "failures": failures},
              sys.stdout, indent=1, sort_keys=True)
    print()


if __name__ == "__main__":
    main()
