"""Orchestrator-level tests for bench.py outage resilience.

Round-2 verdict item 1: the driver's single bench run died at axon backend
init during a documented tunnel outage and the round's perf evidence was
lost (BENCH_r02.json rc=1). bench.py is now a retrying orchestrator; these
tests pin its control flow (retry on failure, relay the child's single JSON
line on success, honest rc=1 after the deadline) without touching any
backend — subprocess.run is monkeypatched.
"""

import json
import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _proc(rc, stdout="", stderr=""):
    return subprocess.CompletedProcess(
        args=[], returncode=rc, stdout=stdout, stderr=stderr
    )


GOOD_LINE = json.dumps(
    {"metric": "walker_updates_per_s_10d_gaussian", "value": 3.7e9,
     "unit": "walker-updates/s/chip", "vs_baseline": 37.0}
)


def test_success_first_attempt_relays_json(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _proc(0, stdout="noise\n" + GOOD_LINE + "\n", stderr="[ok]")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # driver contract: exactly ONE stdout line
    assert json.loads(out[0])["value"] == 3.7e9
    assert len(calls) == 1
    assert "--attempt" in calls[0]


def test_retries_after_init_failure_then_succeeds(monkeypatch, capsys):
    attempts = iter(
        [
            _proc(1, stderr="RuntimeError: Unable to initialize backend"),
            _proc(0, stdout=GOOD_LINE + "\n"),
        ]
    )
    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: next(attempts))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    assert json.loads(capsys.readouterr().out.strip())["vs_baseline"] == 37.0


def test_timeout_expired_is_retried(monkeypatch, capsys):
    state = {"n": 0}

    def fake_run(cmd, timeout=None, **kw):
        state["n"] += 1
        if state["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, timeout, stderr="hang")
        return _proc(0, stdout=GOOD_LINE + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    assert state["n"] == 2


def test_deadline_exhaustion_returns_nonzero(monkeypatch, capsys):
    monkeypatch.setattr(
        bench.subprocess, "run", lambda *a, **k: _proc(1, stderr="down")
    )
    # clock jumps past the deadline after the first attempt
    t = {"now": bench._T0}

    def fake_time():
        t["now"] += bench.OVERALL_DEADLINE_S
        return t["now"]

    monkeypatch.setattr(bench.time, "time", fake_time)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    assert capsys.readouterr().out == ""  # no JSON line on failure


def test_malformed_child_json_is_not_relayed(monkeypatch, capsys):
    attempts = iter(
        [
            _proc(0, stdout="{not json\n"),
            _proc(0, stdout=GOOD_LINE + "\n"),
        ]
    )

    def fake_run(*a, **k):
        try:
            return next(attempts)
        except StopIteration:  # pragma: no cover
            pytest.fail("too many attempts")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    rc = bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    # the malformed line must never reach stdout; the retry's good line does
    assert rc == 0 and len(out) == 1 and json.loads(out[0])["value"] == 3.7e9
