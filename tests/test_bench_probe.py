"""Outage-proofing of the driver artifacts (bench.py relay probe).

Round-3 postmortem: the axon relay went down mid-round and `jax.devices()`
hung forever, leaving BENCH_r03.json with rc=1 and no parseable JSON and
MULTICHIP_r03.json rc=124.  These tests pin the bounded-probe behavior so
both artifacts stay parseable/green through a relay outage.
"""
import json
import subprocess
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench  # noqa: E402


def test_probe_true_on_healthy_backend(monkeypatch):
    def fake_run(*a, **k):
        return subprocess.CompletedProcess(a, 0, stdout="1\n", stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._probe_tpu_alive() is True


def test_probe_false_on_hang(monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_RETRIES", "2")
    monkeypatch.setenv("BENCH_PROBE_BACKOFF_S", "0")
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._probe_tpu_alive() is False
    assert len(calls) == 2  # retried


def test_probe_false_on_backend_error(monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_RETRIES", "1")

    def fake_run(*a, **k):
        return subprocess.CompletedProcess(
            a, 1, stdout="", stderr="RuntimeError: Unable to initialize"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._probe_tpu_alive() is False


def test_error_json_is_parseable(capsys):
    bench._emit_error_json("relay outage")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "e2e_7mic_mixtures_per_sec_per_chip"
    assert d["value"] == 0.0
    assert "error" in d


def test_main_exits_with_json_when_probe_fails(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_tpu_alive", lambda: False)
    with pytest.raises(SystemExit):
        bench.main()
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] == 0.0 and "unavailable" in d["error"]
