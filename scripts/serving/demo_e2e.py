#!/usr/bin/env python
"""End-to-end SERVING demo: train -> calibrate -> serve over HTTP -> score a
held-out cohort through the live endpoint -> evaluate the served predictions.

The reference only *documents* its inference loop (reference
README.md:386-399: load a trained checkpoint, call ``model(image, genomic)``
by hand) and ships no server. This demo closes that loop against the real
HTTP surface: a fold-ensemble ``RiskScorer`` behind ``serving.make_server``,
with per-fold calibration from the training cohort, and EVERY prediction in
the output CSV travels through ``POST /score_batch`` over a real socket.

    python scripts/serving/demo_e2e.py --synthetic \
        --data-root /tmp/demo_cohort --models-dir /tmp/demo_models \
        --out-dir examples/synthetic_demo/results/serving

Artifacts under --out-dir:
  serving_predictions.csv   held-out patients scored via HTTP
  calibration.json          per-fold (mu, sd) from the TRAINING cohort
  evaluation/               evaluate_model battery over the served CSV
  serving_summary.json      holdout C-index + request accounting
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="partial_modality")
    p.add_argument("--data-root", default="/tmp/serving_demo_cohort")
    p.add_argument("--synthetic", action="store_true",
                   help="generate the synthetic cohort at --data-root if "
                        "its matching table is missing")
    p.add_argument("--synthetic-patients", type=int, default=96)
    p.add_argument("--models-dir", default="/tmp/serving_demo_models")
    p.add_argument("--out-dir",
                   default="examples/synthetic_demo/results/serving")
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--n-folds", type=int, default=2)
    p.add_argument("--backbone", default="simple_cnn",
                   choices=["densenet121", "simple_cnn"])
    p.add_argument("--image-shape", default="32,32,32")
    p.add_argument("--serve-batch", type=int, default=8,
                   help="compiled scoring batch (requests micro-batched)")
    p.add_argument("--holdout-frac", type=float, default=0.25,
                   help="labeled patients held OUT of CV training and "
                        "scored only through the HTTP endpoint")
    p.add_argument("--retrain", action="store_true",
                   help="retrain even if fold checkpoints already exist")
    args = p.parse_args()

    import dataclasses

    import numpy as np
    import pandas as pd

    from multimodal_survival_prediction_tpu.analysis import (
        evaluate_predictions,
    )
    from multimodal_survival_prediction_tpu.analysis.evaluate import (
        km_event_types,
        km_groups,
    )
    from multimodal_survival_prediction_tpu.analysis.figures import (
        kaplan_meier_panels,
        km_plot,
        risk_distributions,
    )
    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
    from multimodal_survival_prediction_tpu.data.matching_table import (
        load_matching_table,
    )
    from multimodal_survival_prediction_tpu.serving import (
        RiskScorer,
        make_server,
    )
    from multimodal_survival_prediction_tpu.train.cv import (
        run_cross_validation,
    )
    from multimodal_survival_prediction_tpu.train.predict import (
        fold_checkpoints,
        predict_risk,
    )

    image_shape = tuple(int(x) for x in args.image_shape.split(","))
    root = Path(args.data_root)
    table_csv = root / "data" / "processed" / "full_matching_table.csv"
    if not table_csv.exists():
        if not args.synthetic:
            p.error(f"{table_csv} missing (pass --synthetic to generate)")
        from multimodal_survival_prediction_tpu.data.synthetic import (
            SyntheticCohortSpec,
            generate_synthetic_cohort,
        )
        generate_synthetic_cohort(
            root, SyntheticCohortSpec(n_patients=args.synthetic_patients,
                                      p_imaging=0.8))
        print(f"[demo] synthetic cohort ({args.synthetic_patients} "
              f"patients) at {root}")

    table = load_matching_table(table_csv)
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"

    # -- holdout split: labeled patients only, seeded, never seen by CV -----
    labeled = table[table.has_survival].patient_id.to_numpy()
    rng = np.random.default_rng(42)
    n_hold = max(4, int(round(len(labeled) * args.holdout_frac)))
    holdout = set(rng.permutation(labeled)[:n_hold].tolist())
    train_table = table[~table.patient_id.isin(holdout)].copy()
    hold_table = table[table.patient_id.isin(holdout)].copy()
    print(f"[demo] cohort {len(table)} patients: {len(train_table)} to CV "
          f"training, {len(hold_table)} labeled held out for serving")

    cfg = dataclasses.replace(ALL_CONFIGS[args.model],
                              n_folds=args.n_folds,
                              image_shape=image_shape)

    # -- 1. train (CV driver writes fold_K_best.msgpack + .meta.json) -------
    models_dir = Path(args.models_dir)
    have = list((models_dir / cfg.name).glob("fold_*_best.msgpack"))
    if args.retrain or len(have) < args.n_folds:
        t0 = time.monotonic()
        run_cross_validation(
            cfg, train_table, rnaseq_csv=rnaseq_csv,
            results_dir=str(models_dir / "_results"),
            models_dir=str(models_dir), backbone=args.backbone,
            num_epochs=args.epochs)
        print(f"[demo] trained {cfg.name} ({args.n_folds} folds, "
              f"{args.epochs} epochs) in {time.monotonic() - t0:.0f}s")
    else:
        print(f"[demo] reusing {len(have)} fold checkpoints under "
              f"{models_dir / cfg.name}")
    ckpts = fold_checkpoints(models_dir, cfg.name)

    # -- 2. calibrate on the TRAINING cohort (never the holdout) ------------
    _, stats = predict_risk(cfg, ckpts, train_table, rnaseq_csv=rnaseq_csv,
                            return_fold_stats=True)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "calibration.json").write_text(json.dumps({
        "model": cfg.name, "checkpoints": [str(c) for c in ckpts],
        "stats": stats}, indent=2))
    print(f"[demo] calibration: " + ", ".join(
        f"fold{k} mu={mu:+.3f} sd={sd:.3f}"
        for k, (mu, sd) in enumerate(stats, 1)))

    # -- 3. serve: compiled fold-ensemble scorer behind a real HTTP socket --
    scorer = RiskScorer(args.model, ckpts, batch_size=args.serve_batch,
                        fold_calibration=stats)
    server = make_server(scorer, port=0)
    host, port = server.server_address
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://{host}:{port}"
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        print(f"[demo] server up at {base}: {r.read().decode()}")

    # -- 4. score the holdout THROUGH the endpoint --------------------------
    rna = pd.read_csv(rnaseq_csv, index_col=0) if rnaseq_csv.exists() \
        else pd.DataFrame()
    rows, n_requests = [], 0
    patients, meta = [], []
    for rec in hold_table.itertuples():
        body = {}
        if rec.has_rnaseq and rec.patient_id in rna.index:
            body["rnaseq"] = [float(v) for v in rna.loc[rec.patient_id]]
        if rec.has_clinical and np.isfinite(rec.age):
            body["age"] = float(rec.age)
        if rec.has_imaging and isinstance(rec.nifti_path, str):
            nifti = Path(rec.nifti_path)
            if not nifti.is_absolute():
                nifti = Path.cwd() / nifti
            if nifti.exists():
                body["nifti_path"] = str(nifti)
        if not body:
            continue
        patients.append(body)
        meta.append(rec)
    t0 = time.monotonic()
    for start in range(0, len(patients), args.serve_batch):
        chunk = patients[start:start + args.serve_batch]
        req = urllib.request.Request(
            f"{base}/score_batch",
            data=json.dumps({"patients": chunk}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            results = json.loads(r.read())["results"]
        n_requests += 1
        for rec, res in zip(meta[start:start + args.serve_batch], results):
            rows.append({
                "patient_id": rec.patient_id,
                "risk_score": res["risk_score"],
                "survival_time": float(rec.survival_time),
                "event": int(rec.survival_status),
                "modalities_used": "+".join(
                    k for k, v in res["modalities_used"].items() if v),
            })
    serve_sec = time.monotonic() - t0
    server.shutdown()
    pred = pd.DataFrame(rows)
    pred_csv = out_dir / "serving_predictions.csv"
    pred.to_csv(pred_csv, index=False)
    print(f"[demo] scored {len(pred)} held-out patients via "
          f"{n_requests} HTTP /score_batch requests in {serve_sec:.1f}s "
          f"-> {pred_csv}")

    # -- 5. evaluate the SERVED predictions (evaluate_model battery) --------
    ev = out_dir / "evaluation"
    summary = evaluate_predictions(pred, out_dir=ev)
    hi, lo, lr = km_groups(pred)
    km_plot({"high risk": hi, "low risk": lo}, ev / "km_risk_groups.png",
            title="KM by risk group (served predictions)",
            pvalue=lr.p_value)
    kaplan_meier_panels({"Low Risk": lo, "High Risk": hi},
                        km_event_types(pred),
                        ev / "kaplan_meier_curves.png", pvalue=lr.p_value)
    risk_distributions(pred, ev / "risk_distributions.png")

    out = {
        "model": cfg.name, "n_holdout": len(pred),
        "n_http_requests": n_requests,
        "holdout_c_index": summary["c_index"],
        "logrank_p": summary["logrank"]["p_value"],
        "serve_seconds": round(serve_sec, 1),
        "folds": len(ckpts), "backbone": args.backbone,
    }
    (out_dir / "serving_summary.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
