#!/usr/bin/env python
"""Derive fold-ensemble calibration stats for the serving layer.

Scores the cohort with EVERY fold checkpoint and writes the per-fold
(mu, sd) of the log-hazards — the pairs ``RiskScorer(fold_calibration=...)``
/ ``serve.py --calibration`` consume so single-request ensemble scoring
matches ``predict_risk``'s cohort-level z-scored combination.

    python scripts/serving/calibrate.py --model partial_modality \
        --models-dir models --data-root . --out calibration.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="partial_modality")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--data-root", default=".")
    p.add_argument("--out", default=None,
                   help="default: <models-dir>/<model>/calibration.json")
    args = p.parse_args()

    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
    from multimodal_survival_prediction_tpu.data import load_matching_table
    from multimodal_survival_prediction_tpu.train.predict import (
        fold_checkpoints,
        predict_risk,
    )

    cfg = ALL_CONFIGS[args.model]
    root = Path(args.data_root)
    table = load_matching_table(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"
    if not rnaseq_csv.exists():
        rnaseq_csv = None

    try:
        ckpts = fold_checkpoints(args.models_dir, cfg.name)
    except FileNotFoundError as e:
        print(f"{e} — train the model first")
        return
    _, stats = predict_risk(cfg, ckpts, table, rnaseq_csv=rnaseq_csv,
                            return_fold_stats=True)

    out = Path(args.out or Path(args.models_dir) / cfg.name
               / "calibration.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "model": cfg.name,
        "checkpoints": [str(c) for c in ckpts],
        "stats": stats,  # [(mu, sd), ...] fold-ordered
    }, indent=2))
    print(f"calibration for {len(ckpts)} folds -> {out}")
    for k, (mu, sd) in enumerate(stats, 1):
        print(f"  fold {k}: mu={mu:+.4f} sd={sd:.4f}")


if __name__ == "__main__":
    main()
