"""Structural gates on bench.py's un-losable retry machinery.

Round 4 lost its driver-captured perf record to two blind 850 s attempts
(BENCH_r04 rc=124).  These tests drive ``_run_with_retries`` with a
monkeypatched child runner and a compressed wall budget to prove the
three invariants the round-5 redesign guarantees:

* a dead relay costs probe-sized retries, not attempt-sized ones, and
  the harness exits rc=1 within the budget with a clear stderr trail;
* a full-config failure still produces a valid JSON record through the
  degraded fallback;
* a deterministic compile error skips the retry loop.
"""

import importlib.util
import json
from pathlib import Path

import pytest


class _FakeTime:
    """Deterministic clock: every monotonic() call advances 100 s, so the
    phase structure (probe loop -> bounded full attempts -> degraded
    reserve) plays out in a handful of iterations with no real waiting."""

    def __init__(self, step: float = 100.0):
        self.t = 0.0
        self.step = step

    def monotonic(self) -> float:
        self.t += self.step
        return self.t

    def sleep(self, s: float) -> None:
        self.t += s


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.delenv("BENCH_WALL_BUDGET", raising=False)
    monkeypatch.setattr(mod, "time", _FakeTime())
    return mod


def _fake_child(script):
    """Child runner: dispatches on probe-vs-inner, pops scripted results."""
    def child(args, env, timeout):
        key = "probe" if args[0] == "-c" else (
            "degraded" if env and env.get("BENCH_BATCH") == "16" else "full")
        seq = script[key]
        return seq.pop(0) if len(seq) > 1 else seq[0]
    return child


def test_happy_path(bench, monkeypatch, capsys):
    rec = json.dumps({"metric": "m", "value": 1, "unit": "MP/s",
                      "vs_baseline": 1}).encode()
    monkeypatch.setattr(bench, "_child", _fake_child({
        "probe": [(0, b"PROBE_OK\n", b"")],
        "full": [(0, rec, b"")],
        "degraded": [(1, b"", b"")],
    }))
    assert bench._run_with_retries() == 0
    out = capsys.readouterr().out
    assert json.loads(out)["value"] == 1


def test_probe_retries_then_full(bench, monkeypatch, capsys):
    rec = b'{"metric": "m", "value": 2, "unit": "MP/s", "vs_baseline": 1}'
    monkeypatch.setattr(bench, "_child", _fake_child({
        "probe": [(124, b"", b""), (0, b"PROBE_OK\n", b"")],
        "full": [(0, rec, b"")],
        "degraded": [(1, b"", b"")],
    }))
    assert bench._run_with_retries() == 0
    assert json.loads(capsys.readouterr().out)["value"] == 2


def test_degraded_fallback_still_records(bench, monkeypatch, capsys):
    rec = b'{"metric": "m", "value": 3, "unit": "MP/s", "vs_baseline": 1}'
    monkeypatch.setattr(bench, "_child", _fake_child({
        "probe": [(0, b"PROBE_OK\n", b"")],
        "full": [(124, b"", b"")],          # every full attempt times out
        "degraded": [(0, rec, b"")],
    }))
    assert bench._run_with_retries() == 0
    assert json.loads(capsys.readouterr().out)["value"] == 3


def test_deterministic_error_skips_retries(bench, monkeypatch, capsys):
    calls = []
    rec = b'{"metric": "m", "value": 4, "unit": "MP/s", "vs_baseline": 1}'

    def child(args, env, timeout):
        key = "probe" if args[0] == "-c" else (
            "degraded" if env and env.get("BENCH_BATCH") == "16" else "full")
        calls.append(key)
        if key == "probe":
            return 0, b"PROBE_OK\n", b""
        if key == "full":
            return 1, b"", b"Mosaic failed to compile"
        return 0, rec, b""

    monkeypatch.setattr(bench, "_child", child)
    assert bench._run_with_retries() == 0
    assert calls.count("full") == 1       # no retry burned on the compile error
    assert json.loads(capsys.readouterr().out)["value"] == 4


def test_intermediate_rung_records(bench, monkeypatch, capsys):
    # full config times out but the batch-64 rung lands a real record
    # before the last-resort 16/2 rung is ever reached
    rec = b'{"metric": "m", "value": 5, "unit": "MP/s", "vs_baseline": 1}'

    def child(args, env, timeout):
        if args[0] == "-c":
            return 0, b"PROBE_OK\n", b""
        if env and env.get("BENCH_BATCH") == "64":
            return 0, rec, b""
        if env and env.get("BENCH_BATCH") == "16":
            return 1, b"", b""
        return 124, b"", b""

    monkeypatch.setattr(bench, "_child", child)
    assert bench._run_with_retries() == 0
    captured = capsys.readouterr()
    assert json.loads(captured.out)["value"] == 5
    assert "fallback 64/12 record" in captured.err


def test_dead_relay_exits_clean(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_child", _fake_child({
        "probe": [(124, b"", b"")],        # relay never answers
        "full": [(0, b"x", b"")],
        "degraded": [(0, b"x", b"")],
    }))
    assert bench._run_with_retries() == 1
    assert "never answered" in capsys.readouterr().err
