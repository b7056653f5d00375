"""CLI-level e2e for --streaming: the training entry point with the flag must
train via the host-resident BatchPrefetcher path (Trainer.train_epoch_streaming
/ evaluate_streaming) and write the reference-schema cv_results.json."""

import json
import os
import subprocess
import sys
from pathlib import Path
import pytest

pytestmark = pytest.mark.slow  # subprocess streaming CLI e2e (CLAUDE.md quick/slow split)

REPO_ROOT = Path(__file__).resolve().parents[1]


def test_train_rnaseq_only_streaming_cli(tmp_path):
    env = dict(os.environ)
    # single virtual device is enough (and compiles faster on the 1-core host)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    # skip axon plugin registration entirely: with the pool IP inherited the
    # plugin still registers (and can block on the tunnel) even under
    # JAX_PLATFORMS=cpu — observed as a 600 s near-zero-CPU hang of this very
    # subprocess (CLAUDE.md environment quirks)
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run(
        [sys.executable,
         str(REPO_ROOT / "scripts" / "training" / "train_rnaseq_only.py"),
         "--synthetic", "--synthetic-patients", "16",
         "--data-root", str(tmp_path / "cohort"),
         "--results-dir", str(tmp_path / "results"),
         "--models-dir", str(tmp_path / "models"),
         "--epochs", "1", "--n-folds", "2", "--streaming"],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    payload = json.loads(
        (tmp_path / "results" / "rnaseq_only" / "cv_results.json").read_text())
    assert len(payload["fold_results"]) == 2
    assert 0.0 <= payload["c_index_mean"] <= 1.0
