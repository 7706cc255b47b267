"""Host-health gate (VERDICT r11 #1): the machinery that keeps degraded-host
timings out of the artifacts of record."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import host_health  # noqa: E402


def test_write_probe_measures_positive_throughput(tmp_path):
    mbs = host_health.write_probe(str(tmp_path), mb=16)
    assert mbs > 0


def test_health_check_shape():
    h = host_health.health_check()
    assert set(h) >= {"calibration", "write_mb_s", "floors", "healthy",
                      "failures"}
    assert h["floors"] == host_health.HEALTHY_FLOORS
    # verdict consistency: healthy iff no failures
    assert h["healthy"] == (not h["failures"])


def _force_unhealthy(monkeypatch):
    monkeypatch.setattr(host_health, "health_check", lambda probe_dir=None: {
        "calibration": {"single_thread_sec": 9.9, "parallel_speedup": 1.0},
        "write_mb_s": 1.0, "floors": dict(host_health.HEALTHY_FLOORS),
        "healthy": False, "failures": ["forced"]})


def test_require_healthy_hard_refuses(monkeypatch):
    _force_unhealthy(monkeypatch)
    monkeypatch.delenv("SPARK_GRAFT_SKIP_HEALTH_GATE", raising=False)
    with pytest.raises(SystemExit, match="refusing"):
        host_health.require_healthy("t", retries=1, sleep_sec=0, hard=True)


def test_require_healthy_soft_marks_degraded(monkeypatch):
    _force_unhealthy(monkeypatch)
    monkeypatch.delenv("SPARK_GRAFT_SKIP_HEALTH_GATE", raising=False)
    h = host_health.require_healthy("t", retries=0, sleep_sec=0, hard=False)
    assert h["healthy"] is False and h["failures"]


def test_require_healthy_env_skip(monkeypatch):
    _force_unhealthy(monkeypatch)
    monkeypatch.setenv("SPARK_GRAFT_SKIP_HEALTH_GATE", "1")
    h = host_health.require_healthy("t", retries=0, sleep_sec=0, hard=True)
    assert h["gate_skipped"] is True and h["healthy"] is False


def test_gate_for_artifact_hard_env(monkeypatch):
    _force_unhealthy(monkeypatch)
    monkeypatch.delenv("SPARK_GRAFT_SKIP_HEALTH_GATE", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_REQUIRE_HEALTHY", "1")
    monkeypatch.setenv("SPARK_GRAFT_HEALTH_RETRIES", "0")
    with pytest.raises(SystemExit):
        host_health.gate_for_artifact("t")
    monkeypatch.setenv("SPARK_GRAFT_REQUIRE_HEALTHY", "0")
    h = host_health.gate_for_artifact("t")
    assert h["healthy"] is False
