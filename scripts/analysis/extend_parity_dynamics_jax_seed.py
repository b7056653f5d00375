#!/usr/bin/env python
"""Extend a dynamics twin's JAX side to more INIT seeds (distribution vs
distribution, the flagship round-3b methodology): re-run the framework's CV
driver on the SAME cohort with per-fold inits drawn at other seeds via
``init_hook`` — splits stay bit-identical (split seed is cfg.seed).

Use after `run_parity_dynamics.py --model <m> --data-root <root>` left a
cohort on disk, to turn its single JAX point into a seed range comparable
to the torch oracle's (PARITY_TWIN.md simple_fusion attribution step 4).

Appends a one-paragraph section to PARITY_TWIN.md and updates
parity_dynamics_<model>_jaxseeds.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

import os  # noqa: E402

# Persistent XLA compile cache: the extra-seed CV runs re-trace the exact
# programs a prior run_parity_dynamics.py run compiled (identical cohort
# shapes), so with the shared cache each seed costs train time only, not
# the single-core compile marathon (see run_parity_dynamics.py note).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO_ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["rnaseq_only", "image_only", "simmim",
                            "simple_fusion", "flexible_multimodal", "final",
                            "mmsurv"],
                   help="rnaseq_only extends the ORIGINAL run_parity.py twin "
                        "(50 epochs, 2000-patient spec -> 812-row cohort); "
                        "the rest extend run_parity_dynamics.py twins")
    p.add_argument("--data-root", required=True)
    p.add_argument("--jax-seeds", default="43,44",
                   help="extra init seeds (cfg.seed's point exists already)")
    p.add_argument("--epochs", type=int, default=None,
                   help="stage-2/main epochs; defaults match "
                        "run_parity_dynamics.py so the extra seeds are "
                        "comparable to the recorded twin runs")
    p.add_argument("--stage1-epochs", type=int, default=10,
                   help="simmim stage-1 epochs (run_parity_dynamics default)")
    p.add_argument("--n-folds", type=int, default=3)
    p.add_argument("--image-shape", default="32,32,32")
    p.add_argument("--out-dir", default=str(REPO_ROOT))
    args = p.parse_args()

    import numpy as np

    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
    from multimodal_survival_prediction_tpu.data.matching_table import (
        load_matching_table,
    )
    from multimodal_survival_prediction_tpu.parallel.multihost import (
        fetch_tree,
    )
    from multimodal_survival_prediction_tpu.train.adapters import (
        make_model_and_adapters,
    )
    from multimodal_survival_prediction_tpu.train.cv import (
        prepare_cv_data,
        run_cross_validation,
    )
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    image_shape = tuple(int(x) for x in args.image_shape.split(","))
    seeds = [int(s) for s in args.jax_seeds.split(",")]
    epochs = args.epochs or {"rnaseq_only": 50, "image_only": 30,
                             "simmim": 12, "simple_fusion": 15,
                             "flexible_multimodal": 15, "final": 15,
                             "mmsurv": 15}[args.model]
    root = Path(args.data_root)
    table = load_matching_table(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"

    overrides = dict(n_folds=args.n_folds, image_shape=image_shape)
    if args.model == "simmim":
        overrides["stage1_epochs"] = args.stage1_epochs
    cfg = dataclasses.replace(ALL_CONFIGS[args.model], **overrides)
    prepared = prepare_cv_data(cfg, table, rnaseq_csv=rnaseq_csv)
    arrays, _ = prepared
    print(f"[jaxseed:{args.model}] cohort rows: {arrays.n}")

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

    seed_means = {}
    t_all = time.monotonic()
    for s in seeds:
        inits = {}
        for fold in range(1, cfg.n_folds + 1):
            st = init_trainer.init_state(example, fold=fold, seed=s)
            inits[fold] = fetch_tree(
                {"params": st.params, "batch_stats": st.batch_stats})

        def inject(fold, state, _inits=inits):
            import jax

            iv = _inits[fold]
            return dataclasses.replace(
                state,
                params=jax.device_put(iv["params"]),
                batch_stats=jax.device_put(iv["batch_stats"]))

        t0 = time.monotonic()
        _, outs = run_cross_validation(
            cfg, table, rnaseq_csv=rnaseq_csv, num_epochs=epochs,
            write_outputs=False, prepared=prepared, init_hook=inject)
        folds = [round(o.best_c_index, 4) for o in outs]
        seed_means[s] = round(float(np.mean(folds)), 4)
        print(f"[jaxseed:{args.model}] seed {s}: folds {folds} "
              f"mean {seed_means[s]} (+{time.monotonic() - t0:.0f}s)")

    payload = {"model": args.model, "epochs": epochs,
               "n_folds": cfg.n_folds, "cohort_rows": int(arrays.n),
               "jax_cv_mean_per_init_seed": seed_means,
               "seconds": round(time.monotonic() - t_all, 1)}
    out_dir = Path(args.out_dir)
    (out_dir / f"parity_dynamics_{args.model}_jaxseeds.json").write_text(
        json.dumps(payload, indent=2))

    md = out_dir / "PARITY_TWIN.md"
    line = (
        f"\n\n{args.model}: JAX build CV mean at EXTRA init seeds "
        f"(identical splits, same cohort; via "
        f"scripts/analysis/extend_parity_dynamics_jax_seed.py): "
        + ", ".join(f"seed {s}: {m:.4f}" for s, m in sorted(
            seed_means.items()))
        + f" — to be read against the {args.model} sections above.\n")
    if md.exists():
        md.write_text(md.read_text().rstrip() + line)
    else:
        # Don't raise after the (hours-long) CV runs when pointed at a
        # fresh out-dir — the JSON above already holds the data (ADVICE r4).
        print(f"[jaxseed:{args.model}] {md} absent; JSON written, "
              "markdown append skipped")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
