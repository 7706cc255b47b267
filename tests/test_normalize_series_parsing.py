"""Unit tests for tools/normalize_series.py's artifact loader — the
cross-round fallback series is only as honest as its parsing of the three
artifact shapes (sweep, solo bench, front-truncated driver wrapper).

No Spark needed; pure JSON fixtures in tmp dirs.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from normalize_series import load_artifact  # noqa: E402


def _write(tmp_path, name, doc):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def test_sweep_artifact_shape(tmp_path):
    p = _write(tmp_path, "VERIFY_rX_timings_sf01.json", {
        "timings": {"q1": 2.0, "q2": 4.0},
        "normalized_timings": {"q1": 1.0, "q2": 2.0},
        "health_at_start": {
            "healthy": False,
            "calibration": {"single_thread_sec": 0.2,
                            "parallel_wall_sec": 0.5}},
        "calibration_at_end": {"single_thread_sec": 0.3,
                               "parallel_wall_sec": 0.7},
    })
    a = load_artifact(p)
    assert a["queries"] == {"q1": 2.0, "q2": 4.0}
    # both bracketing calibrations surface — the disagreement IS the
    # error-bar signal (PLANS.md §Round-14)
    assert sorted(a["singles"]) == [0.2, 0.3]
    assert sorted(a["parallels"]) == [0.5, 0.7]
    assert a["healthy"] is False and a["partial"] is False


def test_solo_bench_artifact_shape(tmp_path):
    p = _write(tmp_path, "BENCH_rX_solo.json", {
        "queries": {"q1": 1.5},
        "calibration": {"single_thread_sec": 0.19,
                        "parallel_wall_sec": 0.36},
        "health_at_start": {"healthy": True,
                            "calibration": {"single_thread_sec": 0.18,
                                            "parallel_wall_sec": 0.35}},
    })
    a = load_artifact(p)
    assert a["queries"] == {"q1": 1.5}
    assert a["healthy"] is True and a["partial"] is False


def test_driver_wrapper_tail_is_parsed_and_flagged_partial(tmp_path):
    # the driver keeps only the LAST 2000 chars of the bench line — early
    # queries are cut; the loader must stop query-pair collection at the
    # first top-level metadata anchor so "sf": 0.1 is never read as a
    # query named sf
    tail = ('_topk": 3.40, "graph_pagerank": 7.51, "ewma_user_value": 2.75}, '
            '"sf": 0.1, "ingest_emails_per_sec": 3131.5, '
            '"calibration": {"single_thread_sec": 0.1565, '
            '"parallel_wall_sec": 0.3457}, "health_at_start": {"healthy": '
            'false, "calibration": {"single_thread_sec": 0.1731, '
            '"parallel_wall_sec": 0.3499}}')
    p = _write(tmp_path, "BENCH_rX.json", {"tail": tail, "parsed": False})
    a = load_artifact(p)
    assert a["partial"] is True
    assert a["queries"] == {"graph_pagerank": 7.51, "ewma_user_value": 2.75}
    assert "sf" not in a["queries"]
    assert "ingest_emails_per_sec" not in a["queries"]
    assert sorted(a["singles"]) == [0.1565, 0.1731]
    assert a["healthy"] is False
