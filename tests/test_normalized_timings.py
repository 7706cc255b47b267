"""Calibration-normalized timing series (VERDICT r13 next-round #1).

Three consecutive rounds (r11-r13) produced zero healthy timing windows,
so cross-round engine-performance claims need a series that does not wait
on hypervisor weather. The contract pinned here:

1. the normalization helpers implement the prescribed formula
   (``normalized = wall / (mean single-thread calibration / 0.19)``)
   exactly, plus the supplementary parallel-throughput factor;
2. every NEW timing artifact of record carries BOTH raw and normalized
   per-query numbers (pinned on the round-14 artifacts);
3. the r14 sf0.1 artifact still covers the registry exactly, so the
   normalized series can serve as the cross-round fallback of record.

Raw healthy-window measurements supersede normalized ones — the raw
record pins live in tests/test_scaling_artifacts.py and are unchanged
until tools/healthy_regen.sh fires on a healthy host.
"""

from __future__ import annotations

import json
import os

import pytest

from bench import (HEALTHY_SINGLE_THREAD_FLOOR, host_factor,
                   host_factor_parallel, normalize_timings)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str) -> dict:
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not yet generated this round")
    with open(path) as f:
        return json.load(f)


def test_host_factor_prescribed_formula():
    # floor-speed host -> factor exactly 1.0
    assert host_factor(HEALTHY_SINGLE_THREAD_FLOOR) == 1.0
    # degraded r12-style single-thread 0.209/0.2506 -> mean/0.19
    assert host_factor(0.2089, 0.2506) == round(
        ((0.2089 + 0.2506) / 2) / 0.19, 4)
    # healthy population member normalizes BELOW 1 (faster than floor)
    assert host_factor(0.157) < 1.0
    # missing/zero calibrations degrade to identity, never divide-by-zero
    assert host_factor() == 1.0
    assert host_factor(None, 0.0) == 1.0


def test_host_factor_parallel_floor_and_identity():
    # n_procs passed explicitly: bench.N_CPUS is env-dependent
    # (SPARK_GRAFT_CPUS=4 under the test harness, 32 in sweeps)
    floor_wall = 32 * HEALTHY_SINGLE_THREAD_FLOOR / 17.0
    assert host_factor_parallel(floor_wall, n_procs=32) == 1.0
    assert host_factor_parallel() == 1.0
    # r13's signature: near-healthy single-thread, contended cores — the
    # parallel factor must see what the single-thread factor cannot
    assert host_factor(0.1565) < 1.0
    assert host_factor_parallel(0.8903, n_procs=32) > 2.0


def test_normalize_timings_divides_and_guards():
    t = {"q1": 10.0, "q2": 1.0}
    assert normalize_timings(t, 2.0) == {"q1": 5.0, "q2": 0.5}
    # a zero/negative factor must not corrupt the series
    assert normalize_timings(t, 0.0) == t
    assert normalize_timings({}, 1.3) == {}


def test_r14_sf01_artifact_carries_raw_and_normalized():
    doc = _load("VERIFY_r14_timings_sf01.json")
    raw, norm = doc["timings"], doc["normalized_timings"]
    assert set(raw) == set(norm), "normalized series must mirror raw keys"
    f = doc["host_factor"]
    assert f > 0
    for q, w in raw.items():
        assert norm[q] == pytest.approx(w / f, abs=0.002), q
    # both factors recorded; health verdict embedded (gate contract)
    assert doc["host_factor_parallel"] > 0
    assert isinstance(doc["health_at_start"]["healthy"], bool)
    # the artifact is only a fallback of record if it covers the registry
    from hierarchical_graph_db_spark.queries import load

    assert set(raw) == set(load()), "r14 sf0.1 sweep drifted from registry"
    assert doc["failures"] == []


def test_r14_linkpred_sf1_artifact(request):
    """VERDICT r13 #2: the sf1 `graph_link_prediction` measurement, raw +
    normalized. The r10->r12 series (36.1 -> 257.7 -> 469.8 s) is
    host-monotone; the normalized number is the engine-cost claim."""
    doc = _load("REMEASURE_r14_linkpred_sf1.json")
    assert set(doc["timings"]) == {"graph_link_prediction"}
    f = doc["host_factor"]
    norm = doc["normalized_timings"]["graph_link_prediction"]
    assert norm == pytest.approx(
        doc["timings"]["graph_link_prediction"] / f, abs=0.002)
