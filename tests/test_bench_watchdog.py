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
    on the key marker a previous successful scan-epoch run wrote: every
    recorded key must still have its executable and the env fingerprint
    must match. Generic train_epoch meta tags must NOT count — a training
    CLI sharing the cache dir writes those for different fold shapes, and
    a false warm prediction blows the budget gate by a full remote
    compile."""
    import bench
    from multimodal_survival_prediction_tpu.io.aot_cache import (
        _env_fingerprint,
    )

    monkeypatch.setattr(bench, "AOT_DIR", str(tmp_path))
    assert bench._scan_epoch_cache_warm() is False  # empty cache

    env = _env_fingerprint()
    # a trainer-written entry with matching tags but no bench marker:
    # exactly the false-positive the marker exists to prevent
    (tmp_path / "b.meta.json").write_text(json.dumps(
        {"program": "train_epoch", "model": "PartialModalityNet", **env}))
    assert bench._scan_epoch_cache_warm() is False

    marker = tmp_path / bench.SCAN_EPOCH_MARKER
    marker.write_text(json.dumps({"keys": ["k1"], "env": env}))
    assert bench._scan_epoch_cache_warm() is False  # key's exe missing

    (tmp_path / "k1.jaxexe").write_bytes(b"x")
    assert bench._scan_epoch_cache_warm() is True

    marker.write_text(json.dumps(
        {"keys": ["k1"], "env": {**env, "jax": "0.0.0-other"}}))
    assert bench._scan_epoch_cache_warm() is False  # env drift

    marker.write_text(json.dumps({"keys": [], "env": env}))
    assert bench._scan_epoch_cache_warm() is False  # empty key list

    monkeypatch.setattr(bench, "AOT_DIR", None)
    assert bench._scan_epoch_cache_warm() is False  # disabled


def test_scan_epoch_marker_written_from_trainer_info(tmp_path, monkeypatch):
    """A successful scan-epoch measurement records the exact cache keys its
    trainer program hit (bench._write_scan_epoch_marker)."""
    import bench

    class FakeFn:
        info = {("sig",): {"source": "cache", "key": "abc", "path": "p"}}

    class FakeTrainer:
        _train_epoch_fn = FakeFn()

    monkeypatch.setattr(bench, "AOT_DIR", str(tmp_path))
    bench._write_scan_epoch_marker(FakeTrainer())
    j = json.loads((tmp_path / bench.SCAN_EPOCH_MARKER).read_text())
    assert j["keys"] == ["abc"]
    assert j["env"]  # fingerprint recorded for drift detection


def test_cold_headline_deadline(tmp_path, monkeypatch):
    """A cold headline AOT entry extends the default watchdog with
    compile+first-upload headroom (a slow-tunnel day measured 2026-08-19
    blew the 540 s default on a healthy tunnel); a warm entry or an
    explicit BENCH_WATCHDOG_SEC keeps the arm unchanged."""
    import bench
    from multimodal_survival_prediction_tpu.io.aot_cache import (
        _env_fingerprint,
    )

    monkeypatch.setattr(bench, "AOT_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "WATCHDOG_EXPLICIT", False)
    d = bench._cold_headline_deadline()
    assert d is not None and d > bench.WATCHDOG_SEC  # cold -> headroom

    (tmp_path / "hl.meta.json").write_text(json.dumps(
        {"program": "bench_chunk", "dtype": "bf16", "folds": 1,
         "batch": bench.HEADLINE_BATCH, **_env_fingerprint()}))
    assert bench._cold_headline_deadline() is None  # warm -> default arm

    (tmp_path / "hl.meta.json").unlink()
    monkeypatch.setattr(bench, "WATCHDOG_EXPLICIT", True)
    assert bench._cold_headline_deadline() is None  # user deadline wins


def test_tail_floor_rearm(monkeypatch):
    """bench._tail_floor_rearm extends a nearly-exhausted watchdog deadline
    to the tail floor (late real JSON beats a 0.0 line) and never shortens
    a deadline that already has more than the floor remaining."""
    import time

    import bench

    class FakeWatchdog:
        cancelled = False

        def cancel(self):
            self.cancelled = True

    armed = []
    monkeypatch.setattr(bench, "WATCHDOG_EXPLICIT", False)
    monkeypatch.setattr(bench, "_start_watchdog",
                        lambda sec: armed.append(sec) or FakeWatchdog())

    now = time.perf_counter()
    wd = FakeWatchdog()
    # plenty of deadline left: untouched (a cold-headline extension must
    # never be SHORTENED by the tail floor)
    w2, d2 = bench._tail_floor_rearm(wd, now + 500, now - 100)
    assert w2 is wd and d2 == now + 500 and not armed and not wd.cancelled

    # nearly exhausted: extended to the floor
    w3, d3 = bench._tail_floor_rearm(wd, now + 10, now - 500)
    assert wd.cancelled and armed == [180]
    assert d3 - time.perf_counter() > 170

    # the floor sizes to pending opt-in phases (each can pay a ~360 s
    # remote compile): 180 + 2*360
    armed.clear()
    w4, d4 = bench._tail_floor_rearm(wd, now + 10, now - 500,
                                     pending_optins=2)
    assert armed == [900]
    assert d4 - time.perf_counter() > 880


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
