#!/usr/bin/env python
"""Train every model family end-to-end and produce the full comparison —
the whole reference training+analysis phase as one command.

    python scripts/run_all.py --synthetic --data-root /tmp/cohort \
        --epochs 5 --models rnaseq_only,image_only,partial_modality
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "scripts" / "training"))

from common import base_parser, run_training  # noqa: E402

DEFAULT_MODELS = ("rnaseq_only", "image_only", "simple_fusion",
                  "flexible_multimodal", "final", "partial_modality",
                  "simmim", "mmsurv")


def main():
    p = base_parser(__doc__)
    p.add_argument("--models", default=",".join(DEFAULT_MODELS))
    p.add_argument("--full-analysis", action="store_true",
                   help="after training, run the ENTIRE analysis battery "
                        "(analyze_all_results, comprehensive_analysis, "
                        "final_comparison, report figures, ensemble KM "
                        "curves + evaluation) over the fresh results")
    args = p.parse_args()

    from multimodal_survival_prediction_tpu.analysis import (
        collect_results,
        export_results_json,
        generate_summary_md,
    )
    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS

    failed: list[str] = []
    for name in args.models.split(","):
        name = name.strip()
        cfg = ALL_CONFIGS[name]
        print(f"\n{'=' * 60}\nTraining {cfg.display_name}\n{'=' * 60}")
        try:
            run_training(args, cfg)
        except Exception as e:
            print(f"{name} FAILED: {e}")
            failed.append(f"train:{name}")

    df = collect_results(args.results_dir)
    if len(df):
        out = Path(args.results_dir) / "final_comparison"
        md = generate_summary_md(df, None, out / "SUMMARY.md")
        export_results_json(df, None, out / "results.json")
        print(md)

    if args.full_analysis:
        import subprocess

        a = REPO_ROOT / "scripts" / "analysis"
        common = ["--results-root", str(args.results_dir),
                  "--data-root", str(args.data_root)]
        # KM/evaluation need fold checkpoints: use the flagship when it was
        # trained this run, else the first selected model that has them
        trained = [m.strip() for m in args.models.split(",")]
        km_model = next(
            (m for m in (["partial_modality"] + trained)
             if m in trained
             and any((Path(args.models_dir) / m).glob("fold_*_best.msgpack"))
             ), None)
        km = (["--model", km_model, "--ensemble",
               "--models-dir", str(args.models_dir)] if km_model else None)
        if km is not None and args.hu_window:
            km += [f"--hu-window={args.hu_window}"]
        steps = [
            [str(a / "analyze_all_results.py"), *common],
            [str(a / "comprehensive_analysis.py"), *common],
            [str(a / "final_comparison.py"), *common],
            [str(a / "create_report_figures.py"), *common],
        ]
        if km is not None:
            steps += [
                [str(a / "generate_km_curves.py"), *common, *km],
                [str(a / "evaluate_model.py"), *common,
                 "--predictions",
                 str(Path(args.results_dir) / "test_predictions.csv"),
                 "--out-dir", str(Path(args.results_dir) / "evaluation")],
            ]
        else:
            print("skipping KM curves + evaluation: no fold checkpoints "
                  "for any selected model under", args.models_dir)
        for cmd in steps:
            print(f"\n--- {Path(cmd[0]).name}")
            r = subprocess.run([sys.executable, *cmd])
            if r.returncode:
                print(f"{Path(cmd[0]).name} FAILED (rc={r.returncode})")
                failed.append(f"analysis:{Path(cmd[0]).name}")

    # scripted/CI callers must be able to detect a broken phase — exit
    # nonzero if any training or analysis step failed (each already logged)
    if failed:
        print(f"\nrun_all: {len(failed)} step(s) FAILED: {', '.join(failed)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
