"""bench.py's one-JSON-line invariant must hold even when the backend wedges.

A down axon tunnel blocks the process's FIRST backend use for ~25 minutes
before erroring (observed 2026-08-17, CLAUDE.md quirks) — far beyond the
driver's bench budget. The watchdog thread must emit the failure JSON and
hard-exit regardless of where the main thread is stuck.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def test_bench_watchdog_emits_json_and_exits(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # CLAUDE.md: never inherit into children
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # fire long before the CPU-backend train phase could ever finish
    env["BENCH_WATCHDOG_SEC"] = "1"
    r = subprocess.run(
        [sys.executable, str(REPO_ROOT / "bench.py")],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))  # cwd elsewhere: must not depend on repo CWD
    assert r.returncode == 3, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "partial_modality_epoch_throughput"
    assert payload["value"] == 0.0
    assert "watchdog" in payload["errors"][0]


def test_scan_epoch_cache_warm_detection(tmp_path, monkeypatch):
    """bench._scan_epoch_cache_warm gates the opportunistic scan-epoch phase
    on a pre-warmed AOT executable cache: it must require the train_epoch
    program tag, the flagship model, AND an exact env-fingerprint match
    (anything else risks re-arming the watchdog for a phase that then pays
    a full remote compile)."""
    import bench
    from multimodal_survival_prediction_tpu.io.aot_cache import (
        _env_fingerprint,
    )

    monkeypatch.setattr(bench, "AOT_DIR", str(tmp_path))
    assert bench._scan_epoch_cache_warm() is False  # empty cache

    env = _env_fingerprint()
    (tmp_path / "a.meta.json").write_text(json.dumps(
        {"program": "bench_chunk", "model": "PartialModalityNet", **env}))
    assert bench._scan_epoch_cache_warm() is False  # wrong program tag

    (tmp_path / "b.meta.json").write_text(json.dumps(
        {"program": "train_epoch", "model": "PartialModalityNet", **env}))
    assert bench._scan_epoch_cache_warm() is True

    (tmp_path / "b.meta.json").write_text(json.dumps(
        {"program": "train_epoch", "model": "PartialModalityNet",
         **{**env, "jax": "0.0.0-other"}}))
    assert bench._scan_epoch_cache_warm() is False  # env drift

    monkeypatch.setattr(bench, "AOT_DIR", None)
    assert bench._scan_epoch_cache_warm() is False  # disabled


def test_cache_warm_generalized_tag_matching(tmp_path, monkeypatch):
    """bench._cache_warm gates the opportunistic fold-parallel phase on an
    exact meta-tag match (program/dtype/folds/batch) — a warm bs=128
    headline entry must NOT count as a warm 5-fold bs=8 entry."""
    import bench
    from multimodal_survival_prediction_tpu.io.aot_cache import (
        _env_fingerprint,
    )

    monkeypatch.setattr(bench, "AOT_DIR", str(tmp_path))
    env = _env_fingerprint()
    (tmp_path / "hl.meta.json").write_text(json.dumps(
        {"program": "bench_chunk", "dtype": "bf16", "folds": 1,
         "batch": 128, **env}))
    assert bench._cache_warm(program="bench_chunk", dtype="bf16",
                             folds=5, batch=8) is False
    (tmp_path / "fp.meta.json").write_text(json.dumps(
        {"program": "bench_chunk", "dtype": "bf16", "folds": 5,
         "batch": 8, **env}))
    assert bench._cache_warm(program="bench_chunk", dtype="bf16",
                             folds=5, batch=8) is True
