"""Shared e2e bench stage (utils/e2ebench.py): rep policy unit tests.

The stage is the single source of truth for bench.py and
tools/chip_smoke.py; its storm handling (per-rep cap + retry) decides
whether a driver bench records a number or a timeout, so the control
flow is tested with a faked subprocess — no device, no reference
binary."""

import subprocess
import time
import types

import numpy as np
import pytest

from mm2_gb_tpu.utils import e2ebench


class _FakeRun:
    """Scripted subprocess.run: reference calls succeed instantly; 'our'
    CLI calls follow the given script of 'timeout' / wall seconds."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def __call__(self, cmd, capture_output=True, text=True, env=None,
                 timeout=None):
        self.calls.append((tuple(cmd), timeout))
        if cmd[0] == e2ebench.REF_BIN:
            return types.SimpleNamespace(returncode=0, stdout="GOLD",
                                         stderr="")
        step = self.script.pop(0)
        if step == "timeout":
            raise subprocess.TimeoutExpired(cmd, timeout)
        return types.SimpleNamespace(
            returncode=0, stdout="GOLD",
            stderr="[M::tpu] time: seed 1.0s, device-wait 0.500s, x\n")


def _patch(monkeypatch, fake):
    monkeypatch.setattr(e2ebench, "REF_BIN", "/bin/true")
    monkeypatch.setattr(e2ebench.subprocess, "run", fake)


def test_storm_reps_retried_within_cap(monkeypatch):
    """Two capped (timed-out) reps are retried; the third lands and its
    wall/byte-match are recorded; attempts stay within best_of + 2."""
    fake = _FakeRun(["timeout", "timeout", 0, 0])
    _patch(monkeypatch, fake)
    out = e2ebench.run_config("tpuchain", ["--tpu-chain"], "r.fa", "q.fa",
                              100, best_of=2, breather=0.0)
    assert out["e2e_tpuchain_rep_timeout"] == 2
    assert out["e2e_tpuchain_byte_match"] is True
    assert len(out["e2e_tpuchain_rep_walls"]) == 2
    # device reps carry the storm cap (floor 150 s at a ~0 s ref wall)
    our_timeouts = [t for c, t in fake.calls if c[0] != e2ebench.REF_BIN]
    assert all(t <= 150.0 for t in our_timeouts)


def test_host_config_uncapped_and_uncounted(monkeypatch):
    """Host-only configs (extra == []) never get the device storm cap
    and run exactly best_of reps."""
    fake = _FakeRun([0, 0, 0])
    _patch(monkeypatch, fake)
    t0 = time.time()
    out = e2ebench.run_config("host", [], "r.fa", "q.fa", 100,
                              best_of=2, breather=0.0,
                              remaining=lambda: 1000 - (time.time() - t0))
    assert len(out["e2e_host_rep_walls"]) == 2
    our_timeouts = [t for c, t in fake.calls if c[0] != e2ebench.REF_BIN]
    assert all(t > 150.0 for t in our_timeouts)


def test_budget_exhaustion_stops_retries(monkeypatch):
    """When remaining() collapses, timed-out reps stop retrying and the
    partial record (ref wall + timeout count) survives."""
    fake = _FakeRun(["timeout", "timeout", "timeout", "timeout"])
    _patch(monkeypatch, fake)
    left = [200.0]

    def remaining():
        left[0] -= 80.0
        return left[0]

    out = e2ebench.run_config("tpuchain", ["--tpu-chain"], "r.fa", "q.fa",
                              100, best_of=4, breather=0.0,
                              remaining=remaining)
    assert out["e2e_tpuchain_rep_timeout"] >= 1
    assert "e2e_tpuchain_wall_s" not in out
    assert "e2e_tpuchain_ref_wall_s" in out
