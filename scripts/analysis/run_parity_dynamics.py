#!/usr/bin/env python
"""Training-DYNAMICS twin parity for the image_only and SimMLM families
(VERDICT r3 #2): torch oracle vs JAX build, full CV, same arrays,
bit-identical folds.

These two families carry the repo's riskiest trainer RECONSTRUCTIONS — the
reference ships neither trainer:

* image_only — model only in reference generate_km_curves.py:28-54; the
  trainer is reconstructed from results/image_only artifacts + the
  final_multimodal.py conventions (config.py:IMAGE_ONLY).
* simmim — model in reference generate_km_curves.py:160-281; the two-stage
  MoFe schedule (stage1 expert pretraining -> stage2 ensemble + mofe_lambda
  auxiliary) is reconstructed from results/simmim/cv_results.json
  hyperparameters (train/adapters.py).

Each run drives `benchmarks/torch_twin.py`'s torch implementation of the
SAME reconstruction and the framework's full CV driver on identical arrays,
then compares per-fold best val C-indices (band) and the torch oracle's own
init-seed spread (is the JAX mean inside the oracle's seed range?) — the
same evidence format as PARITY_TWIN.md / PARITY_TWIN_FLAGSHIP.md.

Appends a section per family to PARITY_TWIN.md and writes
parity_dynamics_<family>.json.
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

import os  # noqa: E402

# The JAX-side CV is XLA-compile-dominated on this host's single CPU core
# (distinct whole-epoch scan programs per fold/stage); the persistent
# compilation cache makes repeat runs of the same family — including the
# extend_parity_dynamics_jax_seed.py extra-seed runs, identical shapes —
# skip those compiles entirely (same pattern as benchmarks/
# probe_batch_scaling.py; remote-tunnel compiles are NOT cacheable this
# way, CPU ones are).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO_ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model",
                   choices=["image_only", "simmim", "simple_fusion",
                            "flexible_multimodal", "final", "mmsurv"],
                   required=True)
    p.add_argument("--n-patients", type=int, default=96)
    p.add_argument("--epochs", type=int, default=None,
                   help="stage-2/main epochs (defaults: image_only 30, "
                        "simmim 12, simple_fusion/flexible 15, final 15 — "
                        "the reference counts are 50 (or 30+50); scaled "
                        "down to keep the torch-CPU oracle feasible, the "
                        "SCHEDULE semantics are what is under test)")
    p.add_argument("--stage1-epochs", type=int, default=10,
                   help="simmim stage-1 epochs (reference count 30)")
    p.add_argument("--n-folds", type=int, default=3)
    p.add_argument("--torch-seeds", type=int, default=3)
    p.add_argument("--init-matched", action="store_true",
                   help="start BOTH sides from identical per-fold initial "
                        "weights (JAX init exported via "
                        "io/torch_import.export_torch_state_dict — the "
                        "PARITY_TWIN_FLAGSHIP.md protocol); hazard families "
                        "only (simple_fusion/flexible_multimodal/final). "
                        "Torch seeds then vary only batch-order/dropout RNG.")
    p.add_argument("--no-ragged-tail", action="store_true",
                   help="trim the cohort to the largest size where every "
                        "fold's train set is an exact multiple of the batch "
                        "size — removes the torch-ragged-batch vs "
                        "JAX-cycled-padding deviation (train/engine.py "
                        "module docstring). Fully-labeled cohorts only.")
    p.add_argument("--band", type=float, default=0.08)
    p.add_argument("--image-shape", default="32,32,32")
    p.add_argument("--out-dir", default=str(REPO_ROOT))
    p.add_argument("--data-root", default=None)
    args = p.parse_args()

    import dataclasses

    import numpy as np

    from benchmarks.torch_reference_named import (
        build_reference_named_final,
        build_reference_named_flexible,
        build_reference_named_simple_fusion,
    )
    from benchmarks.torch_twin import (
        build_torch_mmsurv_twin,
        run_torch_hazard_cv,
        run_torch_image_only_cv,
        run_torch_simmlm_cv,
    )
    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
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
    epochs = args.epochs or {"image_only": 30, "simmim": 12,
                             "simple_fusion": 15, "flexible_multimodal": 15,
                             "final": 15, "mmsurv": 15}[args.model]

    if args.data_root:
        root = Path(args.data_root)
    else:
        root = Path(tempfile.mkdtemp(prefix=f"parity_{args.model}_"))
        generate_synthetic_cohort(
            root, SyntheticCohortSpec(
                n_patients=args.n_patients, p_imaging=0.8,
                image_shapes=((40, 48, 48), (36, 40, 40))))
        print(f"[dynamics:{args.model}] synthetic cohort "
              f"({args.n_patients} patients) at {root}")

    table = load_matching_table(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"

    base = ALL_CONFIGS[args.model]
    overrides = dict(n_folds=args.n_folds, image_shape=image_shape)
    if args.model == "simmim":
        overrides["stage1_epochs"] = args.stage1_epochs
    cfg = dataclasses.replace(base, **overrides)

    prepared = prepare_cv_data(cfg, table, rnaseq_csv=rnaseq_csv)
    arrays, _splits = prepared
    print(f"[dynamics:{args.model}] cohort rows: {arrays.n} "
          f"(labeled {int(arrays.arrays['svalid'].sum())})")

    if args.no_ragged_tail:
        if int(arrays.arrays["svalid"].sum()) != arrays.n:
            p.error("--no-ragged-tail supports fully-labeled cohorts only")
        k, bs = cfg.n_folds, cfg.batch_size
        target = next((m for m in range(arrays.n, k - 1, -1)
                       if m % k == 0 and (m - m // k) % bs == 0), None)
        if target is None:
            p.error("no cohort size <= %d gives exact batches" % arrays.n)
        keep = set(arrays.patient_ids[:target])
        table = table[table.patient_id.isin(keep)].copy()
        prepared = prepare_cv_data(cfg, table, rnaseq_csv=rnaseq_csv)
        arrays, _splits = prepared
        tr_sizes = [len(tr) for tr, _, _ in _splits]
        print(f"[dynamics:{args.model}] no-ragged-tail trim -> {arrays.n} "
              f"rows, fold train sizes {tr_sizes} (bs={bs}: "
              f"{'EXACT' if all(t % bs == 0 for t in tr_sizes) else 'STILL RAGGED'})")

    init_exports = None
    init_hook = None
    if args.init_matched:
        if args.model not in ("simple_fusion", "flexible_multimodal",
                              "final"):
            p.error("--init-matched supports the hazard families only")
        from multimodal_survival_prediction_tpu.io.torch_import import (
            export_torch_state_dict,
        )
        from multimodal_survival_prediction_tpu.parallel.multihost import (
            fetch_tree,
        )
        from multimodal_survival_prediction_tpu.train.adapters import (
            make_model_and_adapters,
        )
        from multimodal_survival_prediction_tpu.train.engine import (
            TrainConfig,
            Trainer,
        )

        model, batch_to_inputs, hazard_and_aux = make_model_and_adapters(
            cfg, rna_dim=arrays.arrays["rnaseq"].shape[1])
        tcfg = TrainConfig(
            batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay, optimizer=cfg.optimizer,
            grad_clip=cfg.grad_clip, seed=cfg.seed, ties=cfg.ties)
        init_trainer = Trainer(model, batch_to_inputs, hazard_and_aux, tcfg)
        example = {k: np.asarray(v[:cfg.batch_size])
                   for k, v in arrays.arrays.items()}
        example["valid"] = example["svalid"]
        inits = {}
        for fold in range(1, cfg.n_folds + 1):
            st = init_trainer.init_state(example, fold=fold, seed=cfg.seed)
            inits[fold] = fetch_tree(
                {"params": st.params, "batch_stats": st.batch_stats})
            print(f"[dynamics:{args.model}] captured JAX init fold={fold}")
        init_exports = [export_torch_state_dict(args.model, inits[f])
                        for f in range(1, cfg.n_folds + 1)]

        def init_hook(fold, state):
            import dataclasses as _dc

            import jax

            iv = inits[fold]
            return _dc.replace(
                state,
                params=jax.device_put(iv["params"]),
                batch_stats=jax.device_put(iv["batch_stats"]))

    t0 = time.monotonic()
    torch_runs = {}
    for s in range(args.torch_seeds):
        seed = cfg.seed + s
        if args.model == "image_only":
            torch_runs[seed] = run_torch_image_only_cv(
                arrays.arrays, n_folds=cfg.n_folds, num_epochs=epochs,
                batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
                weight_decay=cfg.weight_decay, patience=cfg.patience,
                grad_clip=cfg.grad_clip, seed=seed, split_seed=cfg.seed)
        elif args.model == "simmim":
            torch_runs[seed] = run_torch_simmlm_cv(
                arrays.arrays, n_folds=cfg.n_folds,
                stage1_epochs=cfg.stage1_epochs, num_epochs=epochs,
                batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
                weight_decay=cfg.weight_decay,
                mofe_lambda=cfg.mofe_lambda, patience=cfg.patience,
                grad_clip=cfg.grad_clip, seed=seed, split_seed=cfg.seed)
        else:
            build, inputs = {
                "simple_fusion": (
                    lambda rd: build_reference_named_simple_fusion(rd),
                    lambda t, b: (t["image"][b], t["rnaseq"][b])),
                "flexible_multimodal": (
                    lambda rd: build_reference_named_flexible(rd),
                    lambda t, b: (t["image"][b], t["rnaseq"][b],
                                  t["mask"][b][:, :2])),
                "final": (
                    lambda rd: build_reference_named_final(rd),
                    lambda t, b: (t["image"][b], t["rnaseq"][b],
                                  t["clinical"][b])),
                "mmsurv": (
                    lambda rd: build_torch_mmsurv_twin(rd),
                    lambda t, b: (t["image"][b], t["rnaseq"][b],
                                  t["clinical"][b], t["mask"][b])),
            }[args.model]
            torch_runs[seed] = run_torch_hazard_cv(
                arrays.arrays, build, inputs, n_folds=cfg.n_folds,
                num_epochs=epochs, batch_size=cfg.batch_size,
                learning_rate=cfg.learning_rate,
                weight_decay=cfg.weight_decay, optimizer=cfg.optimizer,
                scheduler=cfg.scheduler, patience=cfg.patience,
                grad_clip=cfg.grad_clip, seed=seed, split_seed=cfg.seed,
                init_state_dicts=init_exports)
        print(f"[dynamics:{args.model}] torch CV (init seed {seed}) done "
              f"at +{time.monotonic() - t0:.1f}s")
    torch_folds = torch_runs[cfg.seed]
    torch_sec = time.monotonic() - t0

    t0 = time.monotonic()
    _, jax_outcomes = run_cross_validation(
        cfg, table, rnaseq_csv=rnaseq_csv, num_epochs=epochs,
        write_outputs=False, prepared=prepared, init_hook=init_hook)
    jax_sec = time.monotonic() - t0
    print(f"[dynamics:{args.model}] jax CV done in {jax_sec:.1f}s")

    rows = []
    for tf, jo in zip(torch_folds, jax_outcomes):
        rows.append({
            "fold": tf["fold"],
            "torch_best_c": round(tf["best_c_index"], 4),
            "jax_best_c": round(jo.best_c_index, 4),
            "delta": round(jo.best_c_index - tf["best_c_index"], 4),
            "torch_best_epoch": tf["best_epoch"],
            "jax_best_epoch": jo.best_epoch,
            # per-epoch trajectories — the attribution signal (is a delta a
            # level shift, a variance difference max-selection amplifies, …)
            "torch_val_c_by_epoch": [round(h["val_c_index"], 4)
                                     for h in tf.get("history", [])],
            "jax_val_c_by_epoch": [round(h["val_c_index"], 4)
                                   for h in jo.history],
            "torch_train_loss_by_epoch": [round(h["train_loss"], 4)
                                          for h in tf.get("history", [])],
            "jax_train_loss_by_epoch": [round(h["train_loss"], 4)
                                        for h in jo.history],
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
        "model": args.model,
        "config": {"n_patients": args.n_patients, "epochs": epochs,
                   "stage1_epochs": (cfg.stage1_epochs
                                     if args.model == "simmim" else None),
                   "n_folds": cfg.n_folds, "batch_size": cfg.batch_size,
                   "image_shape": list(image_shape),
                   "cohort_rows": int(arrays.n), "band": args.band,
                   "no_ragged_tail": bool(args.no_ragged_tail)},
        "torch": {"c_index_mean": round(t_mean, 4),
                  "c_index_std": round(t_std, 4),
                  "seconds": round(torch_sec, 1),
                  "cv_mean_per_init_seed": seed_means},
        "jax": {"c_index_mean": round(j_mean, 4),
                "c_index_std": round(j_std, 4),
                "seconds": round(jax_sec, 1)},
        "mean_delta": round(mean_delta, 4),
        "within_band": ok,
        "init_matched": bool(args.init_matched),
        "folds": rows,
    }
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    suffix = ("_initmatched" if args.init_matched else "") + \
        ("_noragged" if args.no_ragged_tail else "")
    (out_dir / f"parity_dynamics_{args.model}{suffix}.json").write_text(
        json.dumps(payload, indent=2))

    title = {
        "image_only": "image_only dynamics twin",
        "simmim": "SimMLM two-stage dynamics twin",
        "simple_fusion": "simple_fusion dynamics twin",
        "flexible_multimodal": "flexible_multimodal dynamics twin",
        "final": "final (complete multimodal) dynamics twin",
        "mmsurv": "MMsurv dynamics twin (vs this repo's own spec)",
    }[args.model]
    what = {
        "image_only":
            "torch side: `benchmarks/torch_twin.py:run_torch_image_only_cv` "
            "— the SAME trainer reconstruction (the reference ships the "
            "ImageOnlyModel only inside generate_km_curves.py:28-54 with no "
            "trainer) implemented independently in torch: Adam(L2 wd), "
            "plateau-on-val-C, clip 1.0, patience early stop, pooled "
            "per-epoch val C.",
        "simmim":
            "torch side: `benchmarks/torch_twin.py:run_torch_simmlm_cv` — "
            "the two-stage MoFe schedule reconstruction (reference ships NO "
            "SimMLM trainer; schedule from results/simmim/cv_results.json: "
            "stage-1 expert pretraining at fixed LR -> stage-2 ensemble Cox "
            "+ mofe_lambda x mean per-expert masked Cox, one Adam across "
            "both stages, plateau + patience in stage 2) implemented "
            "independently in torch against the reference-named "
            "SimMLM_SurvivalNet (generate_km_curves.py:160-281).",
        "simple_fusion":
            "torch side: `benchmarks/torch_twin.py:run_torch_hazard_cv` "
            "with the reference-named SimpleFusionModel "
            "(simple_fusion.py:160-236 loop semantics: AdamW wd=1e-3, "
            "cosine LR, clip 1.0, no early stop).",
        "flexible_multimodal":
            "torch side: `benchmarks/torch_twin.py:run_torch_hazard_cv` "
            "with the reference-named FlexibleMultimodalModel "
            "(flexible_multimodal.py:157-256: learnable missing-modality "
            "biases; AdamW wd=1e-3, cosine LR, clip 1.0, no early stop).",
        "final":
            "torch side: `benchmarks/torch_twin.py:run_torch_hazard_cv` "
            "with the reference-named MultiModalSurvivalNet "
            "(final_multimodal.py:59-150, :350-351 loop semantics: "
            "Adam L2 wd=1e-4, ReduceLROnPlateau on val C, clip 1.0, "
            "patience-15).",
        "mmsurv":
            "torch side: `benchmarks/torch_twin.py:build_torch_mmsurv_twin` "
            "— an INDEPENDENT torch implementation of THIS repo's "
            "from-scratch MMsurv design (models/mmsurv.py; the reference "
            "ships no code for this family, only "
            "results/mmsurv/cv_results.json hyperparameters): same "
            "count-sketch constants, CBP FFT, masked pre-norm transformer, "
            "masked mean-pool; Adam L2, plateau, clip 1.0, patience-15.",
    }[args.model]
    im_note = (
        " INIT-MATCHED: both sides start every fold from IDENTICAL initial "
        "weights (JAX fold init exported via "
        "io/torch_import.export_torch_state_dict, loaded strict — the "
        "PARITY_TWIN_FLAGSHIP.md protocol); torch init seeds vary only "
        "batch-order/dropout RNG." if args.init_matched else "")
    lines = [
        f"## {title}{' — INIT-MATCHED' if args.init_matched else ''} "
        "(appended)",
        "",
        "Same synthetic cohort, identical arrays (framework data layer), "
        "bit-identical sklearn KFold(seed 42) splits. " + what
        + " JAX side: the framework's full CV driver." + im_note,
        "",
        f"Cohort: {arrays.n} patients, {epochs} epochs"
        + (f" (+{cfg.stage1_epochs} stage-1)" if args.model == "simmim"
           else "")
        + f", {cfg.n_folds} folds, bs={cfg.batch_size}, image {image_shape}."
        + (" NO-RAGGED-TAIL: cohort trimmed so every fold's train size is an"
           " exact multiple of the batch size (no torch short batch, no JAX"
           " cycled padding)." if args.no_ragged_tail else "")
        + (" Epoch counts scaled down from the reference 30+50 to keep the "
           "torch-CPU oracle feasible — the schedule SEMANTICS are what is "
           "under test." if args.model == "simmim" else ""),
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
            ("Torch oracle CV mean at different batch-order/dropout RNG "
             "seeds (identical splits, IDENTICAL init weights): "
             if args.init_matched else
             "Torch oracle CV mean at different init seeds (identical "
             "splits): ")
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
        f"Generated by `scripts/analysis/run_parity_dynamics.py --model "
        f"{args.model}"
        + (" --init-matched" if args.init_matched else "")
        + f"` (torch {torch_sec:.0f}s, jax {jax_sec:.0f}s).",
        "",
    ]
    md = out_dir / "PARITY_TWIN.md"
    if md.exists():
        md.write_text(md.read_text().rstrip() + "\n\n" + "\n".join(lines))
    else:
        md.write_text("\n".join(lines))
    print(json.dumps(payload, indent=2))
    print(f"[dynamics:{args.model}] appended to {md}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
