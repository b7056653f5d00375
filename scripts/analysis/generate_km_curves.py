#!/usr/bin/env python
"""Kaplan-Meier curves from trained checkpoints.

The reference's scripts/analysis/generate_km_curves.py holds model
definitions but its main body is a stub ("additional implementation needed",
reference :377-384). This version actually works: it rebuilds the requested
model, loads a fold's best checkpoint, scores the labeled cohort
(train.predict.predict_risk), median-splits into risk groups, renders KM
curves with a log-rank test, and writes the predictions CSV that
evaluate_model.py consumes."""

from common import base_parser, parse_hu_window


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default="partial_modality",
                   help="model name (config key)")
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--ensemble", action="store_true",
                   help="score with ALL fold checkpoints (per-fold z-scored "
                        "log-hazards averaged) instead of --fold's one")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--backbone", default=None,
                   choices=["densenet121", "simple_cnn"],
                   help="default: the checkpoint's .meta.json, else densenet121")
    import argparse

    p.add_argument("--pallas-resample", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="force the fused Pallas resample on/off "
                        "(--no-pallas-resample overrides a checkpoint whose "
                        ".meta.json recorded use_pallas_resample=true); "
                        "default: follow the checkpoint metadata")
    p.add_argument("--hu-window", default=None,
                   help="CT Hounsfield window 'lo,hi' — must match the value "
                        "the checkpoint was TRAINED with (use the = form for "
                        "negative bounds: --hu-window=-150,250)")
    args = p.parse_args()

    from pathlib import Path

    from multimodal_survival_prediction_tpu.analysis.evaluate import km_groups
    from multimodal_survival_prediction_tpu.analysis.figures import km_plot
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

    if args.ensemble:
        try:
            ckpt = fold_checkpoints(args.models_dir, cfg.name)
        except FileNotFoundError as e:
            print(f"{e} — train the model first")
            return
        label = "ensemble"
        title = f"{cfg.display_name} fold ensemble ({len(ckpt)} folds)"
    else:
        ckpt = Path(args.models_dir) / cfg.name / \
            f"fold_{args.fold}_best.msgpack"
        if not ckpt.exists():
            print(f"checkpoint not found: {ckpt} — train the model first")
            return
        label = f"fold{args.fold}"
        title = f"{cfg.display_name} fold {args.fold}"

    pred = predict_risk(cfg, ckpt, table, rnaseq_csv=rnaseq_csv,
                        backbone=args.backbone,
                        use_pallas=args.pallas_resample,
                        hu_window=parse_hu_window(args.hu_window))
    hi, lo, lr = km_groups(pred)
    out_dir = Path(args.out_dir or Path(args.results_root) / "km_curves")
    km_plot({"high risk": hi, "low risk": lo},
            out_dir / f"{cfg.name}_{label}_km.png",
            title=title, pvalue=lr.p_value)
    pred.to_csv(out_dir / f"{cfg.name}_{label}_predictions.csv",
                index=False)
    # the contract evaluate_model.py reads (reference evaluate_model.py)
    pred.to_csv(Path(args.results_root) / "test_predictions.csv", index=False)
    print(f"log-rank p={lr.p_value:.4g}; artifacts -> {out_dir}")


if __name__ == "__main__":
    main()
