"""State-store boundedness gates (VERDICT r9 next-round #4).

The §2.8 claims — watermarked state evicted at the horizon, HLL/CMS state ≤
groups×m — are MEASURED here with the same harness that produces
STREAMING_STATE_r10.json (tools/streaming_state_probe.py): the events
fixture split into time-ordered chunks, one chunk per micro-batch, per-batch
``stateOperators`` recorded. Gates are at sf0.001 for suite speed; the
artifact carries the sf0.1 measurement.

What makes these real gates and not tautologies: ``wm_dedup_unique`` keys on
(user_id, event_type, ts) — EVERY input row is a distinct key, so without
watermark eviction state would equal cumulative input (the reference's
forever-growing unique index). Bounded state here can only come from
eviction.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.001"
N_CHUNKS = 6


@pytest.fixture(scope="module")
def state_results(spark):
    from streaming_state_probe import run_all

    workdir = tempfile.mkdtemp(prefix="hgdb_state_gate_")
    try:
        yield run_all(spark, SF_DIR, workdir, N_CHUNKS)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _series(res, name):
    r = res[name]
    rows = [max((s["rows"] for s in b["state"]), default=0)
            for b in r["batches"]]
    return r, rows


def test_wm_dedup_state_is_horizon_bounded_not_cumulative(state_results):
    r, rows = _series(state_results, "wm_dedup_unique")
    assert r["n_batches"] >= N_CHUNKS
    cum = r["cumulative_input_rows"]
    assert cum >= 900  # every row a distinct key
    # without eviction state == cumulative keys; with the 2h watermark it
    # can never exceed ~one chunk (added this batch) + the horizon tail
    chunk = cum / N_CHUNKS
    assert r["max_state_rows"] <= 2 * chunk, \
        f"state {r['max_state_rows']} grew past one batch + horizon ({chunk})"
    # after the final (drain) batch only the last horizon's keys remain
    assert r["final_state_rows"] <= chunk / 2


def test_interval_join_state_is_horizon_bounded(state_results):
    r, rows = _series(state_results, "interval_join")
    cum = r["cumulative_input_rows"]
    chunk = cum / N_CHUNKS
    assert r["max_state_rows"] <= 2 * chunk
    assert r["final_state_rows"] <= chunk / 2


def test_tumbling_append_state_tracks_open_windows(state_results):
    r, rows = _series(state_results, "tumbling_append")
    # windows close as the watermark passes them: state never approaches the
    # cumulative window count and the drain batch leaves only the horizon's
    # open windows
    assert r["max_state_rows"] < r["cumulative_input_rows"] / 2
    assert r["final_state_rows"] <= 48  # ≤ (2h horizon + slack) × event types


def test_hll_state_bounded_by_groups_times_m(state_results):
    r, rows = _series(state_results, "hll_registers")
    # the whole point of sketch-as-state: ≤ groups × m rows regardless of
    # stream length (here ≤ event types × 1024 registers), decoupled from
    # input volume — cardinality lands in register VALUES, not state rows
    assert r["max_state_rows"] <= 8 * 1024
    assert r["max_state_rows"] < r["cumulative_input_rows"] / 2
    # monotone register-cell discovery converges: the back half of the
    # stream adds few new cells compared to the front half
    grown_back = rows[-1] - rows[len(rows) // 2]
    assert grown_back <= rows[len(rows) // 2]


def test_cms_state_bounded_by_grid(state_results):
    r, rows = _series(state_results, "cms_grid")
    # hard cap: the grid shape itself, regardless of stream length or
    # distinct-item count
    assert r["max_state_rows"] <= 4 * 64
