#!/usr/bin/env python
"""Twin-run quality-parity harness: torch oracle vs JAX build, same cohort.

The reference's quality claims are C-index means under K-fold CV (SURVEY §6);
without real TCGA data, the strongest achievable parity evidence is a twin
run — train the torch reference architecture (benchmarks/torch_twin.py, a
faithful re-creation of reference train_rnaseq_only.py:157-287) and this
framework's JAX build on the SAME synthetic cohort with bit-identical
sklearn KFold(seed 42) splits, and compare per-fold best validation
C-indices. Both sides consume the identical array set produced by the
framework's data layer, so the comparison isolates the training stack
(model init / BatchNorm / optimizer / schedule / loss), not the data path.

Residual noise sources (documented in PARITY.md): independent weight-init
RNG streams (same distributions, different draws), independent per-epoch
shuffle orders, and the JAX engine's padded-tail BatchNorm deviation
(train/engine.py module docstring).

Writes PARITY_TWIN.md + parity_results.json at the repo root (or
--out-dir); linked from PARITY.md (the component map) and README.
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
    p.add_argument("--n-patients", type=int, default=400,
                   help="synthetic cohort size (RNA+survival subset trains)")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--n-folds", type=int, default=3)
    p.add_argument("--band", type=float, default=0.05,
                   help="max |mean C-index delta| to declare parity")
    p.add_argument("--torch-seeds", type=int, default=1,
                   help="run the torch oracle at N init seeds (42, 43, ...) "
                        "with identical splits, to show the JAX delta "
                        "against the oracle's own seed-to-seed variance")
    p.add_argument("--out-dir", default=str(REPO_ROOT))
    p.add_argument("--data-root", default=None,
                   help="reuse an existing cohort instead of generating one")
    args = p.parse_args()

    import dataclasses

    import numpy as np

    from benchmarks.torch_twin import run_torch_rnaseq_cv
    from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
    from multimodal_survival_prediction_tpu.data.datasets import (
        build_cohort_arrays,
        load_rnaseq_matrix,
        select_cohort,
    )
    from multimodal_survival_prediction_tpu.data.matching_table import (
        load_matching_table,
    )
    from multimodal_survival_prediction_tpu.data.synthetic import (
        SyntheticCohortSpec,
        generate_synthetic_cohort,
    )
    from multimodal_survival_prediction_tpu.train.cv import (
        run_cross_validation,
    )

    if args.data_root:
        root = Path(args.data_root)
    else:
        root = Path(tempfile.mkdtemp(prefix="parity_cohort_"))
        generate_synthetic_cohort(
            root, SyntheticCohortSpec(n_patients=args.n_patients))
        print(f"[parity] synthetic cohort ({args.n_patients} patients) "
              f"at {root}")

    table = load_matching_table(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"

    # ---- identical array extraction (mirrors train/cv.py rnaseq_only) ----
    cohort = select_cohort(table, "rnaseq_only")
    rnaseq_df = load_rnaseq_matrix(rnaseq_csv)
    cohort = cohort[cohort.patient_id.isin(set(rnaseq_df.index))]
    arrays = build_cohort_arrays(cohort, rnaseq_df, with_image=False)
    X = arrays.arrays["rnaseq"]
    time_arr = arrays.arrays["time"]
    event_arr = arrays.arrays["event"]
    print(f"[parity] cohort rows: {len(X)} "
          f"(events {int(event_arr.sum())})")

    cfg = dataclasses.replace(RNASEQ_ONLY, n_folds=args.n_folds)

    # ---- torch oracle (possibly at several init seeds, same splits) ----
    t0 = time.monotonic()
    torch_runs = {}
    for s in range(args.torch_seeds):
        torch_runs[cfg.seed + s] = run_torch_rnaseq_cv(
            X, time_arr, event_arr, n_folds=cfg.n_folds,
            num_epochs=args.epochs, batch_size=cfg.batch_size,
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay,
            seed=cfg.seed + s, split_seed=cfg.seed)
        print(f"[parity] torch CV (init seed {cfg.seed + s}) done "
              f"at +{time.monotonic() - t0:.1f}s")
    torch_folds = torch_runs[cfg.seed]
    torch_sec = time.monotonic() - t0

    # ---- JAX build (full framework CV driver) ----
    t0 = time.monotonic()
    _, jax_outcomes = run_cross_validation(
        cfg, table, rnaseq_csv=rnaseq_csv, num_epochs=args.epochs,
        write_outputs=False)
    jax_sec = time.monotonic() - t0
    print(f"[parity] jax CV done in {jax_sec:.1f}s")

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
                   "cohort_rows": int(len(X)),
                   "events": int(event_arr.sum()), "band": args.band},
        "torch": {"c_index_mean": round(t_mean, 4),
                  "c_index_std": round(t_std, 4),
                  "seconds": round(torch_sec, 1),
                  "cv_mean_per_init_seed": seed_means},
        "jax": {"c_index_mean": round(j_mean, 4),
                "c_index_std": round(j_std, 4), "seconds": round(jax_sec, 1)},
        "mean_delta": round(mean_delta, 4),
        "within_band": ok,
        "folds": rows,
    }
    out_dir = Path(args.out_dir)
    (out_dir / "parity_results.json").write_text(
        json.dumps(payload, indent=2))

    lines = [
        "# PARITY_TWIN — torch oracle vs JAX build (twin run)",
        "",
        "Same synthetic cohort, same arrays (framework data layer), "
        "bit-identical sklearn `KFold(shuffle=True, random_state=42)` "
        "splits. Torch side: `benchmarks/torch_twin.py` (faithful "
        "re-creation of reference `train_rnaseq_only.py:157-287`). JAX "
        "side: the framework's full CV driver "
        "(`multimodal_survival_prediction_tpu/train/cv.py`) with the "
        "rnaseq_only config.",
        "",
        f"Cohort: {payload['config']['cohort_rows']} RNA+survival patients "
        f"({payload['config']['events']} events), {args.epochs} epochs, "
        f"{cfg.n_folds} folds, bs={cfg.batch_size}, AdamW(1e-4, wd=1e-3), "
        "cosine schedule.",
        "",
        "| fold | torch best C | JAX best C | delta | torch best epoch | JAX best epoch |",
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
            + ("INSIDE the oracle's own seed range — the JAX/torch gap is "
               "indistinguishable from init noise."
               if inside else
               "outside the oracle's seed range by "
               f"{min(abs(j_mean - m) for m in seed_means.values()):.4f}."),
            "",
        ]
    lines += [
        "Residual noise sources: independent weight-init RNG draws (same "
        "torch-default distributions on both sides, "
        "`models/layers.py`), independent per-epoch shuffle orders, and "
        "the JAX engine's padded-tail BatchNorm deviation "
        "(`train/engine.py` module docstring). The reference's own "
        "fold-to-fold std on real data is 0.009–0.074 (BASELINE.md), so "
        "agreement of CV means at this band is the meaningful claim; "
        "exact ±0.005 parity is only defined against the reference's "
        "shipped per-fold numbers on real TCGA data.",
        "",
        f"Generated by `scripts/analysis/run_parity.py` "
        f"(torch {torch_sec:.0f}s, jax {jax_sec:.0f}s).",
        "",
    ]
    (out_dir / "PARITY_TWIN.md").write_text("\n".join(lines))
    print(json.dumps(payload, indent=2))
    print(f"[parity] wrote {out_dir / 'PARITY_TWIN.md'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
