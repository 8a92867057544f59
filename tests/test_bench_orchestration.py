"""Crash-resilience tests for the bench.py orchestrator (VERDICT r3 #1).

BENCH_r03.json was a crash (rc=1, no JSON) because the round-3 bench retried
in-process against a dead TPU worker.  The round-4 orchestrator never imports
jax, runs every attempt in a fresh subprocess, and must (a) retry transient
backend deaths with a new process, (b) fall back checkpoints->halve-batch on
OOM, and (c) emit a parseable JSON line with "value": null when everything
fails — never exit nonzero.

These tests monkeypatch the subprocess layer and drive main() directly.
"""
import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def benchmod(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    monkeypatch.setattr(mod, "detect_backend", lambda: "cpu")
    return mod


def _drive(benchmod, monkeypatch, capsys, script, argv=("128", "4")):
    """Run main() with _run_sub served from a scripted list of
    (rc, stdout, stderr) results; returns (emitted json dict, calls)."""
    calls = []

    def fake_run_sub(args, timeout):
        calls.append(args)
        if not script:
            raise AssertionError("orchestrator made more attempts than scripted")
        return script.pop(0)

    monkeypatch.setattr(benchmod, "_run_sub", fake_run_sub)
    monkeypatch.setattr(sys, "argv", ["bench.py", *argv])
    benchmod.main()
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1]), calls


def _ok_worker(sps=10.0, scan=12.0, batch=4):
    line = benchline = "LM_BENCH_RESULT " + json.dumps(
        {"sps": sps, "sps_scan": scan, "batch": batch}
    )
    return (0, line + "\n", "")


def test_success_first_try(benchmod, monkeypatch, capsys):
    rec, calls = _drive(benchmod, monkeypatch, capsys, [_ok_worker()])
    assert rec["value"] == 10.0
    assert rec["steps_per_sec_scan"] == 12.0
    assert len(calls) == 1
    assert "--worker" in calls[0]


def test_transient_death_retried_in_fresh_process(benchmod, monkeypatch, capsys):
    dead = (1, "", "jax.errors.JaxRuntimeError: UNAVAILABLE: TPU worker "
                   "process crashed or restarted.")
    rec, calls = _drive(benchmod, monkeypatch, capsys,
                        [dead, dead, _ok_worker()])
    assert rec["value"] == 10.0
    # same config retried: batch stayed 4, checkpoints stayed off
    assert calls[1][-3:] == ["4", "0", "3"] and calls[2][-3:] == ["4", "0", "3"]


def test_oom_falls_back_checkpoints_then_batch(benchmod, monkeypatch, capsys):
    oom = (1, "", "RESOURCE_EXHAUSTED: Out of memory allocating 123 bytes")
    rec, calls = _drive(
        benchmod, monkeypatch, capsys,
        [oom, oom, _ok_worker(batch=2)],
    )
    assert rec["value"] == 10.0
    assert calls[0][-3:] == ["4", "0", "3"]  # first: batch 4, no checkpoints
    assert calls[1][-3:] == ["4", "1", "3"]  # OOM -> checkpoints on
    assert calls[2][-3:] == ["2", "1", "3"]  # OOM again -> batch halved
    assert rec["metric"].endswith("_b2")


def test_total_failure_still_emits_null_json(benchmod, monkeypatch, capsys):
    dead = (1, "", "UNAVAILABLE: TPU worker process crashed or restarted")
    # 1 initial + 4 transient retries, all dead -> null record, no exception
    rec, _ = _drive(benchmod, monkeypatch, capsys, [dead] * 5)
    assert rec["value"] is None
    assert rec["steps_per_sec_scan"] is None
    assert "diagnostic" in rec and "UNAVAILABLE" in rec["diagnostic"]
    assert rec["metric"].startswith("3d_lddmm_atlas_steps_per_sec_chip_")


def test_timeout_treated_as_transient(benchmod, monkeypatch, capsys):
    hung = (-9, "", "[orchestrator] attempt timed out")
    rec, calls = _drive(benchmod, monkeypatch, capsys, [hung, _ok_worker()])
    assert rec["value"] == 10.0
    assert len(calls) == 2


def test_unknown_failure_gets_one_retry_then_null(benchmod, monkeypatch, capsys):
    weird = (1, "", "ValueError: something unexpected")
    rec, calls = _drive(benchmod, monkeypatch, capsys, [weird, weird])
    assert rec["value"] is None
    assert len(calls) == 2


def test_bare_invocation_benches_all_configs(benchmod, monkeypatch, capsys):
    # no CLI args -> headline 128^3 b4 plus the four extras in one record
    script = [
        _ok_worker(sps=12.0, scan=13.0, batch=4),   # headline
        _ok_worker(sps=55.0, scan=60.0, batch=4),   # 64^3 b4
        _ok_worker(sps=4.2, scan=4.6, batch=1),     # 256^3 b1
        _ok_worker(sps=350.0, scan=480.0, batch=8),  # 2D 256^2 b8
        _ok_worker(sps=96.0, scan=105.0, batch=8),  # 2D 512^2 b8
    ]
    rec, calls = _drive(benchmod, monkeypatch, capsys, script, argv=())
    assert rec["value"] == 12.0
    assert rec["metric"].endswith("128cubed_b4")
    assert set(rec["configs"]) == {
        "64cubed_b4", "256cubed_b1", "2d_256sq_b8", "2d_512sq_b8"
    }
    assert rec["configs"]["64cubed_b4"]["sps_scan"] == 60.0
    assert rec["configs"]["2d_256sq_b8"]["sps"] == 350.0
    assert rec["configs"]["2d_512sq_b8"]["sps_scan"] == 105.0
    # 2D configs dispatched with ndim=2
    assert calls[3][-3:] == ["8", "0", "2"]
    assert calls[4][-3:] == ["8", "0", "2"]
    # output stays ONE parseable line
    assert len(json.dumps(rec).splitlines()) == 1


def test_extra_config_failure_does_not_kill_headline(benchmod, monkeypatch,
                                                     capsys):
    weird = (1, "", "ValueError: kaboom")
    script = [
        _ok_worker(sps=12.0, scan=13.0, batch=4),   # headline ok
        weird, weird,                                # 64^3 fails out
        _ok_worker(sps=4.2, scan=4.6, batch=1),     # 256^3 ok
        _ok_worker(sps=350.0, scan=480.0, batch=8),  # 2D 256^2 ok
        _ok_worker(sps=96.0, scan=105.0, batch=8),  # 2D 512^2 ok
    ]
    rec, _ = _drive(benchmod, monkeypatch, capsys, script, argv=())
    assert rec["value"] == 12.0
    assert rec["configs"]["64cubed_b4"]["sps"] is None
    assert "diagnostic" in rec["configs"]["64cubed_b4"]
    assert rec["configs"]["256cubed_b1"]["sps"] == 4.2
