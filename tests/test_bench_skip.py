"""bench.py outage robustness (VERDICT r3 #2).

BENCH_r03 failed rc=1 with a raw traceback when the axon relay was down;
a capture must instead emit ONE structured JSON line distinguishing
"infra down" from "bench broken". These tests simulate the outage by
monkeypatching the process-level probe.
"""

import json

import bench  # conftest puts the repo root on sys.path


def _run_ensure(monkeypatch, capsys, probe, retries=2):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # force the probe path
    monkeypatch.setenv("BENCH_ATTACH_RETRIES", str(retries))
    monkeypatch.setenv("BENCH_ATTACH_BACKOFF", "0")
    monkeypatch.setenv("BENCH_ATTACH_SETTLE", "0")
    monkeypatch.setattr(bench, "_probe_backend", probe)
    ok = bench._ensure_backend()
    return ok, capsys.readouterr().out


def test_outage_emits_skip_json(monkeypatch, capsys):
    calls = []

    def probe(timeout_s):
        calls.append(timeout_s)
        return False, "simulated relay outage"

    ok, out = _run_ensure(monkeypatch, capsys, probe, retries=2)
    assert not ok
    assert len(calls) == 2  # retried at process level
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1  # exactly ONE structured line
    rec = json.loads(lines[0])
    assert rec["skipped"] is True
    assert rec["reason"] == "tpu_unavailable"
    assert rec["attempts"] == 2
    assert "simulated relay outage" in rec["detail"]


def test_healthy_backend_proceeds_silently(monkeypatch, capsys):
    ok, out = _run_ensure(
        monkeypatch, capsys, lambda t: (True, "PNP_BENCH_BACKEND tpu 8.0")
    )
    assert ok
    assert out == ""  # no skip line on the healthy path


def test_cpu_run_skips_the_probe(monkeypatch, capsys):
    def boom(timeout_s):  # pragma: no cover - must not be called
        raise AssertionError("probe must not run for JAX_PLATFORMS=cpu")

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(bench, "_probe_backend", boom)
    assert bench._ensure_backend() is True
    assert capsys.readouterr().out == ""


def test_real_probe_subprocess_on_cpu(monkeypatch):
    # End-to-end probe against a real subprocess (CPU backend): the
    # success detection parses the sentinel line, not just rc.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    ok, detail = bench._probe_backend(240)
    assert ok, detail
    assert "PNP_BENCH_BACKEND cpu" in detail


def test_probe_rejects_silent_cpu_fallback(monkeypatch):
    # A plugin that errors at init (instead of hanging) makes JAX fall
    # back to CPU with rc 0 — the probe must treat that as an outage,
    # not record a 1-core CPU number under a TPU metric name.
    import subprocess

    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    class FakeDone:
        returncode = 0
        stdout = "PNP_BENCH_BACKEND cpu 512.0\n"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: FakeDone())
    ok, detail = bench._probe_backend(10)
    assert not ok
    assert "fell back to cpu" in detail
