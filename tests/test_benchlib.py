"""The shared load gate (benchlib.py) used by both bench harnesses:
its (load, timed_out) contract is what lets committed BENCH artifacts
self-label their measurement window."""

from __future__ import annotations

import benchlib


def test_gate_opens_immediately_when_quiet(monkeypatch):
    monkeypatch.setattr(benchlib, "loadavg_1m", lambda: 1.25)
    load, timed_out = benchlib.wait_for_quiet(max_load=5.0, timeout_s=60)
    assert load == 1.25 and timed_out is False


def test_gate_times_out_loaded(monkeypatch):
    monkeypatch.setattr(benchlib, "loadavg_1m", lambda: 9.0)
    load, timed_out = benchlib.wait_for_quiet(
        max_load=5.0, timeout_s=0, poll_s=0)
    assert load == 9.0 and timed_out is True


def test_gate_waits_for_load_to_drop(monkeypatch):
    seq = iter([8.0, 7.0, 2.0])
    monkeypatch.setattr(benchlib, "loadavg_1m", lambda: next(seq))
    monkeypatch.setattr(benchlib.time, "sleep", lambda s: None)
    load, timed_out = benchlib.wait_for_quiet(
        max_load=5.0, timeout_s=60, poll_s=0)
    assert load == 2.0 and timed_out is False
