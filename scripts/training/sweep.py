#!/usr/bin/env python
"""Hyperparameter sweep entry point: train many (seed, lr) candidates of one
model family SIMULTANEOUSLY (vmapped + optionally fold-mesh-sharded; see
multimodal_survival_prediction_tpu/train/sweep.py). The reference tunes by
editing constants and re-running scripts serially (SURVEY §2.11).

Example:
  python scripts/training/sweep.py --model rnaseq_only --synthetic \\
      --seeds 42,43,44 --lrs 1e-4,3e-4,1e-3 --epochs 20 --sweep-mesh 8
"""

from common import (  # noqa: F401  (sys.path side effect)
    REPO_ROOT,
    base_parser,
    parse_hu_window,
)


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default="rnaseq_only",
                   help="config key (see config.ALL_CONFIGS)")
    p.add_argument("--seeds", default=None,
                   help="comma-separated init/shuffle seeds to sweep "
                        "(default: the model's base seed)")
    p.add_argument("--lrs", default=None,
                   help="comma-separated base learning rates to sweep "
                        "(default: --learning-rate or the model's base LR)")
    p.add_argument("--fold", type=int, default=1,
                   help="which seed-42 KFold split supplies train/val")
    p.add_argument("--sweep-mesh", type=int, default=0,
                   help="shard candidates over an N-device fold mesh")
    args = p.parse_args()

    # base_parser flags the sweep driver cannot honor must fail loudly, not
    # silently train something other than what the user asked for
    for flag, val, none in (("--mesh", args.mesh, 0), ("--tp", args.tp, 1),
                            ("--fold-parallel", args.fold_parallel, 0),
                            ("--fold-dp", args.fold_dp, 1),
                            ("--resume", args.resume, False),
                            ("--profile-dir", args.profile_dir, None),
                            ("--streaming", args.streaming, False),
                            ("--sharded-risk-set",
                             args.sharded_risk_set, False),
                            ("--aot-cache", args.aot_cache, None),
                            ("--multihost", args.multihost, False)):
        if val != none:
            raise SystemExit(f"{flag} is not supported by the sweep driver "
                             f"(candidates parallelize via --sweep-mesh)")

    import logging
    from pathlib import Path

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
    from multimodal_survival_prediction_tpu.data import load_matching_table
    from multimodal_survival_prediction_tpu.train.cv_parallel import (
        make_fold_mesh,
    )
    from multimodal_survival_prediction_tpu.train.sweep import (
        run_hyperparameter_sweep,
    )

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    cfg = ALL_CONFIGS[args.model]
    if args.stage1_epochs is not None and not cfg.stage1_epochs:
        raise SystemExit(
            f"--stage1-epochs only applies to two-stage models (SimMLM); "
            f"'{cfg.name}' has no stage 1")
    cfg = cfg.with_overrides(
        n_folds=args.n_folds, batch_size=args.batch_size,
        stage1_epochs=args.stage1_epochs, ties=args.ties,
        image_shape=(tuple(int(x) for x in args.image_shape.split(","))
                     if args.image_shape else None))

    seeds = (tuple(int(s) for s in args.seeds.split(","))
             if args.seeds else
             ((args.seed,) if args.seed is not None else (cfg.seed,)))
    lrs = (tuple(float(x) for x in args.lrs.split(","))
           if args.lrs else
           ((args.learning_rate,) if args.learning_rate is not None
            else None))

    root = Path(args.data_root)
    if args.synthetic:
        from multimodal_survival_prediction_tpu.data.synthetic import (
            SyntheticCohortSpec,
            generate_synthetic_cohort,
        )
        table, paths = generate_synthetic_cohort(
            root, SyntheticCohortSpec(n_patients=args.synthetic_patients))
        rnaseq_csv = paths["rnaseq_csv"]
    else:
        table = load_matching_table(
            root / "data" / "processed" / "full_matching_table.csv")
        rnaseq_csv = root / "data" / "processed" / \
            "rnaseq_normalized_mapped.csv"
        if not rnaseq_csv.exists():
            rnaseq_csv = None

    board = run_hyperparameter_sweep(
        cfg, table, rnaseq_csv=rnaseq_csv,
        seeds=seeds,
        learning_rates=lrs,
        fold=args.fold,
        mesh=make_fold_mesh(args.sweep_mesh) if args.sweep_mesh > 1 else None,
        backbone=args.backbone,
        dtype=jnp.bfloat16 if args.bf16 else None,
        remat=args.remat,
        num_epochs=args.epochs,
        results_dir=args.results_dir,
        use_pallas_resample=args.pallas_resample,
        hu_window=parse_hu_window(args.hu_window),
    )
    print(f"\n{cfg.display_name} sweep — top candidates:")
    for r in board[:10]:
        print(f"  seed={r['seed']:<4d} lr={r['learning_rate']:<8g} "
              f"best C={r['best_c_index']:.4f} @ epoch {r['best_epoch']}")


if __name__ == "__main__":
    main()
