"""End-to-end test of scripts/serving/demo_e2e.py — the serving demo leg:
train -> calibrate -> serve over a real HTTP socket -> score held-out
patients through POST /score_batch -> evaluate the served CSV (closes the
reference README.md:386-399 load-and-infer loop the reference only
documents; it ships no server)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # subprocess train+serve e2e (quick/slow split)

REPO_ROOT = Path(__file__).resolve().parents[1]


def test_serving_demo_e2e(tmp_path):
    env = dict(os.environ)
    # single virtual device + forced CPU; clearing the axon pool IP is
    # MANDATORY for subprocesses (plugin registration can block on the
    # tunnel even under JAX_PLATFORMS=cpu — CLAUDE.md environment quirks)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out_dir = tmp_path / "serving"
    r = subprocess.run(
        [sys.executable,
         str(REPO_ROOT / "scripts" / "serving" / "demo_e2e.py"),
         "--synthetic", "--synthetic-patients", "28",
         "--data-root", str(tmp_path / "cohort"),
         "--models-dir", str(tmp_path / "models"),
         "--out-dir", str(out_dir),
         "--epochs", "2", "--n-folds", "2",
         "--image-shape", "12,12,8", "--backbone", "simple_cnn",
         "--serve-batch", "4"],
        capture_output=True, text=True, timeout=1800, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    # every prediction in the CSV travelled through the HTTP endpoint
    summary = json.loads((out_dir / "serving_summary.json").read_text())
    assert summary["n_http_requests"] >= 1
    assert summary["folds"] == 2
    assert 0.0 <= summary["holdout_c_index"] <= 1.0

    pred = pd.read_csv(out_dir / "serving_predictions.csv")
    assert summary["n_holdout"] == len(pred) > 0
    assert {"patient_id", "risk_score", "survival_time",
            "event"} <= set(pred.columns)
    assert pred.risk_score.notna().all()

    # calibration came from the training cohort (fold-ordered (mu, sd))
    cal = json.loads((out_dir / "calibration.json").read_text())
    assert len(cal["stats"]) == 2

    # evaluate_model battery over the served predictions
    ev = out_dir / "evaluation"
    assert json.loads(
        (ev / "evaluation_summary.json").read_text())["c_index"] == \
        pytest.approx(summary["holdout_c_index"])
    for fig in ("km_risk_groups.png", "kaplan_meier_curves.png",
                "risk_distributions.png"):
        assert (ev / fig).exists()
