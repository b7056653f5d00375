#!/usr/bin/env python
"""Flagship twin-run parity: torch oracle vs JAX build for the GATED
PARTIAL-MODALITY model (the reference's flagship family).

Extends run_parity.py (RNA-only) to the multimodal path: DenseNet121-3D CT
encoder + masked modality features + gate + Cox with the unlabeled-in-train
fold trick — exercising BatchNorm3d statistics, modality masks, gate-entropy
regularization, Adam(L2), grad clipping, and ReduceLROnPlateau, none of
which the RNA-only twin touches. Both sides consume the identical array set
produced by the framework data layer; sklearn KFold(seed 42) splits over the
labeled rows are bit-identical by construction.

Image shape defaults to 32x32x32 — the smallest cube that survives
DenseNet121's five spatial halvings — to keep the torch-CPU oracle feasible
(the reference's 64x64x32 costs ~9.4 s/step on this CPU, SURVEY §6).

Writes PARITY_TWIN_FLAGSHIP.md + parity_flagship_results.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-patients", type=int, default=96)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--n-folds", type=int, default=3)
    p.add_argument("--band", type=float, default=0.08,
                   help="max |mean C-index delta| to declare parity (wider "
                        "than RNA-only: smaller val folds, noisier metric)")
    p.add_argument("--torch-seeds", type=int, default=1)
    p.add_argument("--image-shape", default="32,32,32")
    p.add_argument("--out-dir", default=str(REPO_ROOT))
    p.add_argument("--data-root", default=None)
    p.add_argument("--append", action="store_true",
                   help="append this run as a new section of "
                        "PARITY_TWIN_FLAGSHIP.md (and a tagged JSON) instead "
                        "of overwriting — used for the reference-shape "
                        "64x64x32 run on top of the round-2 32x32x32 one")
    p.add_argument("--tag", default=None,
                   help="section title / JSON suffix for --append")
    args = p.parse_args()

    import dataclasses

    import numpy as np

    from benchmarks.torch_twin import run_torch_partial_modality_cv
    from multimodal_survival_prediction_tpu.config import PARTIAL_MODALITY
    from multimodal_survival_prediction_tpu.data.matching_table import (
        load_matching_table,
    )
    from multimodal_survival_prediction_tpu.data.synthetic import (
        SyntheticCohortSpec,
        generate_synthetic_cohort,
    )
    from multimodal_survival_prediction_tpu.train.cv import (
        prepare_cv_data,
        run_cross_validation,
    )

    image_shape = tuple(int(x) for x in args.image_shape.split(","))
    if args.data_root:
        root = Path(args.data_root)
    else:
        root = Path(tempfile.mkdtemp(prefix="parity_flagship_"))
        generate_synthetic_cohort(
            root, SyntheticCohortSpec(
                n_patients=args.n_patients, p_imaging=0.6,
                image_shapes=((40, 48, 48), (36, 40, 40))))
        print(f"[parity-flagship] synthetic cohort ({args.n_patients} "
              f"patients) at {root}")

    table = load_matching_table(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"

    cfg = dataclasses.replace(PARTIAL_MODALITY, n_folds=args.n_folds,
                              image_shape=image_shape)

    # identical arrays for both sides via the framework data layer; the
    # prepared pair is handed to run_cross_validation below so the NIfTI
    # decode + resample happens once, not twice
    prepared = prepare_cv_data(cfg, table, rnaseq_csv=rnaseq_csv)
    arrays, _splits = prepared
    sv = arrays.arrays["svalid"]
    print(f"[parity-flagship] cohort rows: {arrays.n} "
          f"(labeled {int(sv.sum())}, imaging "
          f"{int(arrays.arrays['mask'][:, 0].sum())})")

    t0 = time.monotonic()
    torch_runs = {}
    for s in range(args.torch_seeds):
        torch_runs[cfg.seed + s] = run_torch_partial_modality_cv(
            arrays.arrays, n_folds=cfg.n_folds, num_epochs=args.epochs,
            batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            gate_entropy_weight=cfg.gate_entropy_weight,
            patience=cfg.patience, grad_clip=cfg.grad_clip,
            seed=cfg.seed + s, split_seed=cfg.seed)
        print(f"[parity-flagship] torch CV (init seed {cfg.seed + s}) done "
              f"at +{time.monotonic() - t0:.1f}s")
    torch_folds = torch_runs[cfg.seed]
    torch_sec = time.monotonic() - t0

    t0 = time.monotonic()
    _, jax_outcomes = run_cross_validation(
        cfg, table, rnaseq_csv=rnaseq_csv, num_epochs=args.epochs,
        write_outputs=False, prepared=prepared)
    jax_sec = time.monotonic() - t0
    print(f"[parity-flagship] jax CV done in {jax_sec:.1f}s")

    rows = []
    for tf, jo in zip(torch_folds, jax_outcomes):
        rows.append({
            "fold": tf["fold"],
            "torch_best_c": round(tf["best_c_index"], 4),
            "jax_best_c": round(jo.best_c_index, 4),
            "delta": round(jo.best_c_index - tf["best_c_index"], 4),
            "torch_best_epoch": tf["best_epoch"],
            "jax_best_epoch": jo.best_epoch,
        })
    t_mean = float(np.mean([r["torch_best_c"] for r in rows]))
    j_mean = float(np.mean([r["jax_best_c"] for r in rows]))
    t_std = float(np.std([r["torch_best_c"] for r in rows]))
    j_std = float(np.std([r["jax_best_c"] for r in rows]))
    mean_delta = j_mean - t_mean
    ok = abs(mean_delta) <= args.band
    seed_means = {
        s: round(float(np.mean([f["best_c_index"] for f in folds])), 4)
        for s, folds in torch_runs.items()
    }

    payload = {
        "config": {"n_patients": args.n_patients, "epochs": args.epochs,
                   "n_folds": cfg.n_folds, "batch_size": cfg.batch_size,
                   "image_shape": list(image_shape),
                   "cohort_rows": int(arrays.n),
                   "labeled": int(sv.sum()), "band": args.band},
        "torch": {"c_index_mean": round(t_mean, 4),
                  "c_index_std": round(t_std, 4),
                  "seconds": round(torch_sec, 1),
                  "cv_mean_per_init_seed": seed_means},
        "jax": {"c_index_mean": round(j_mean, 4),
                "c_index_std": round(j_std, 4),
                "seconds": round(jax_sec, 1)},
        "mean_delta": round(mean_delta, 4),
        "within_band": ok,
        "folds": rows,
    }
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = args.tag or "x".join(str(s) for s in image_shape)
    json_name = (f"parity_flagship_results_{tag}.json" if args.append
                 else "parity_flagship_results.json")
    (out_dir / json_name).write_text(json.dumps(payload, indent=2))

    lines = [
        (f"## {tag} run (appended)" if args.append else
         "# PARITY_TWIN_FLAGSHIP — torch oracle vs JAX build "
         "(gated partial-modality twin run)"),
        "",
        "Same synthetic cohort, identical arrays (framework data layer), "
        "bit-identical sklearn `KFold(shuffle=True, random_state=42)` "
        "splits over the survival-labeled rows, unlabeled patients appended "
        "to every train set. Torch side: "
        "`benchmarks/torch_twin.py:run_torch_partial_modality_cv` "
        "(faithful re-creation of reference "
        "`partial_modality_training.py:364-560`, architecture-identical "
        "DenseNet121-3D gated net). JAX side: the framework's full CV "
        "driver with the partial_modality config.",
        "",
        f"Cohort: {arrays.n} patients ({int(sv.sum())} labeled), "
        f"{args.epochs} epochs, {cfg.n_folds} folds, bs={cfg.batch_size}, "
        f"image {image_shape}, Adam(1e-4, wd=1e-4 L2), "
        "ReduceLROnPlateau, clip 1.0, gate entropy 0.01.",
        "",
        "| fold | torch best C | JAX best C | delta | torch best epoch | "
        "JAX best epoch |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['fold']} | {r['torch_best_c']:.4f} | "
            f"{r['jax_best_c']:.4f} | {r['delta']:+.4f} | "
            f"{r['torch_best_epoch']} | {r['jax_best_epoch']} |")
    lines += [
        "",
        f"**torch mean ± std: {t_mean:.4f} ± {t_std:.4f}**  ",
        f"**JAX   mean ± std: {j_mean:.4f} ± {j_std:.4f}**  ",
        f"**mean delta: {mean_delta:+.4f}** "
        f"(band ±{args.band}: {'WITHIN' if ok else 'OUTSIDE'})",
        "",
    ]
    if len(seed_means) > 1:
        spread = max(seed_means.values()) - min(seed_means.values())
        inside = (min(seed_means.values()) - 1e-9 <= j_mean
                  <= max(seed_means.values()) + 1e-9)
        lines += [
            "Torch oracle CV mean at different init seeds (identical "
            "splits): "
            + ", ".join(f"seed {s}: {m:.4f}"
                        for s, m in sorted(seed_means.items()))
            + f" — seed-to-seed spread {spread:.4f}. The JAX mean "
            f"({j_mean:.4f}) falls "
            + ("INSIDE the oracle's own seed range."
               if inside else
               "outside the oracle's seed range by "
               f"{min(abs(j_mean - m) for m in seed_means.values()):.4f}."),
            "",
        ]
    lines += [
        "Residual noise beyond the RNA-only twin (PARITY_TWIN.md): "
        "BatchNorm3d running statistics under different batch "
        "compositions, the torch side's ragged last batch vs the JAX "
        "engine's cycled padding (train/engine.py module docstring), and "
        "small labeled val folds (noisier C-index), hence the wider band.",
        "",
        f"Generated by `scripts/analysis/run_parity_flagship.py` "
        f"(torch {torch_sec:.0f}s, jax {jax_sec:.0f}s).",
        "",
    ]
    md = out_dir / "PARITY_TWIN_FLAGSHIP.md"
    if args.append and md.exists():
        md.write_text(md.read_text().rstrip() + "\n\n" + "\n".join(lines))
    else:
        md.write_text("\n".join(lines))
    print(json.dumps(payload, indent=2))
    print(f"[parity-flagship] wrote {md}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
