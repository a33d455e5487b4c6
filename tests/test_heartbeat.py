"""Watchdog-liveness heartbeat + divergence-abort monitor.

These two mechanisms exist because of two concrete production failures:
the round-4c flagship soak was killed by its stall watchdog during a
healthy cap-growth recompile (runs/soak_hac_r4c.log), and the round-4
30k soak burned ~2 h of chip after its model had already collapsed
(runs/soak_hac_r4.log). See gauspcc_tpu/utils/heartbeat.py.
"""

import os
import time

import pytest

from gauspcc_tpu.utils.heartbeat import (
    DivergenceMonitor, Heartbeat, NullHeartbeat)


def _mtime(p):
    return os.stat(p).st_mtime


def test_beat_touches_file(tmp_path):
    p = str(tmp_path / "hb")
    hb = Heartbeat(p)
    assert os.path.exists(p)
    t0 = _mtime(p)
    time.sleep(0.05)
    hb.beat()
    assert _mtime(p) > t0


def test_guard_keeps_file_warm_through_blocking_section(tmp_path):
    p = str(tmp_path / "hb")
    hb = Heartbeat(p, interval=0.05, max_s=60.0)
    t0 = _mtime(p)
    with hb.guard("compile"):
        time.sleep(0.3)  # "recompile": no beat() calls from the main loop
        mid = _mtime(p)
    assert mid > t0, "guard thread must touch the file during the block"
    assert _mtime(p) >= mid  # exit beats once more


def test_guard_budget_bounds_liveness(tmp_path):
    # a guard must NOT mask a genuine hang forever: after max_s the
    # thread stops touching and the watchdog's stall clock starts
    p = str(tmp_path / "hb")
    hb = Heartbeat(p, interval=0.05, max_s=0.12)
    with hb.guard("hang"):
        time.sleep(0.5)
        stale = _mtime(p)
        time.sleep(0.3)
        assert _mtime(p) == pytest.approx(stale), (
            "guard kept beating past its max_s budget")


def test_null_heartbeat_is_inert(tmp_path):
    hb = NullHeartbeat()
    hb.beat()
    with hb.guard("x"):
        pass


def test_divergence_monitor_warmup_and_drop():
    m = DivergenceMonitor(drop_db=3.0, warmup=1)
    assert not m.update(10.0)   # warmup reading, never aborts
    assert not m.update(22.0)   # rising
    assert not m.update(25.0)
    assert not m.update(22.5)   # -2.5 dB from max: within tolerance
    assert m.update(21.9)       # -3.1 dB from max 25.0: abort
    assert m.best == 25.0


def test_divergence_monitor_first_reading_huge_drop_ignored():
    # warmup protects against a noisy first checkpoint
    m = DivergenceMonitor(drop_db=3.0, warmup=2)
    assert not m.update(30.0)
    assert not m.update(5.0)    # second reading still inside warmup
    assert m.update(5.0)        # third: 25 dB below max -> abort
