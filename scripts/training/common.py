"""Shared CLI plumbing for the training entry points.

Each script mirrors one reference training entry point (reference
scripts/training/*.py) — same cohort rules, hyperparameter defaults, and
artifact outputs (results/<model>/cv_results.json + models/<model>/fold_K
checkpoints) — but as a thin wrapper over the library, with flags instead of
edit-the-constants configuration (SURVEY §2.11)."""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--data-root", default=".",
                   help="root containing data/processed/full_matching_table.csv")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--n-folds", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--backbone", default="densenet121",
                   choices=["densenet121", "simple_cnn"],
                   help="CT encoder (simple_cnn = reference's MONAI-less fallback)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate & train on a synthetic cohort (no TCGA data)")
    p.add_argument("--synthetic-patients", type=int, default=64)
    p.add_argument("--mesh", type=int, default=0,
                   help="use an N-device data-parallel mesh (0 = single device)")
    p.add_argument("--fold-parallel", type=int, default=0, metavar="N",
                   help="train ALL CV folds simultaneously, sharded over an "
                        "N-device fold mesh (N=1: vmapped on one device). "
                        "Mutually exclusive with --mesh/--tp/--resume/"
                        "--profile-dir; see train/cv_parallel.py")
    p.add_argument("--fold-dp", type=int, default=1, metavar="M",
                   help="with --fold-parallel N: also batch-DP each fold "
                        "over an inner M-device 'data' axis (N total devices "
                        "= N/M folds x M-way DP)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel factor within the mesh (wide RNA "
                        "GEMMs column-sharded over the 'model' axis)")
    p.add_argument("--image-shape", default=None,
                   help="D,H,W for the CT training tensor (default 64,64,32)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize DenseNet layers (fit larger batches)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype for encoders")
    p.add_argument("--pallas-resample", action="store_true")
    p.add_argument("--hu-window", default=None,
                   help="CT Hounsfield window 'lo,hi' (use the = form for "
                        "negative bounds: --hu-window=-150,250) applied "
                        "before normalization — capability the reference "
                        "README claims but its code lacks; off by default "
                        "for parity")
    p.add_argument("--stage1-epochs", type=int, default=None,
                   help="SimMLM expert-pretraining epochs (stage 1) override")
    p.add_argument("--ties", default=None, choices=["breslow", "efron"],
                   help="Cox ties handling (default breslow = reference "
                        "parity; efron is more accurate under tied event "
                        "times — day-resolution survival data ties often)")
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--resume", action="store_true",
                   help="checkpoint full train state periodically and resume "
                        "an interrupted CV run")
    p.add_argument("--checkpoint-every", type=int, default=10)
    p.add_argument("--sharded-risk-set", action="store_true",
                   help="with --mesh N: compute the train Cox loss with the "
                        "distributed risk-set prefix scan (the batch axis "
                        "stays sharded through the logcumsumexp instead of "
                        "all-gathering hazards) — the scaling path for "
                        "whole-biobank risk sets; Breslow and Efron ties")
    p.add_argument("--streaming", action="store_true",
                   help="keep the cohort on host and double-buffer batches "
                        "onto the device (for cohorts exceeding HBM); same "
                        "trajectory as the default device-resident scan "
                        "epoch, which is faster whenever the data fits")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-process (multi-host pod) run: "
                        "initialize jax.distributed, build ONE global mesh "
                        "over every chip of every host (ICIxDCN-aware), and "
                        "write artifacts from the coordinator only. Run the "
                        "IDENTICAL command on every host. On Cloud TPU pods "
                        "the cluster is auto-detected; elsewhere pass "
                        "--coordinator/--num-processes/--process-id")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="with --multihost: coordination-service address "
                        "(omit on Cloud TPU pods)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="with --multihost: total process count (omit on "
                        "Cloud TPU pods)")
    p.add_argument("--process-id", type=int, default=None,
                   help="with --multihost: this process's id (omit on "
                        "Cloud TPU pods)")
    p.add_argument("--aot-cache", default=None, metavar="DIR",
                   help="persist compiled epoch/eval executables to DIR "
                        "(io/aot_cache.py): a later run with the same "
                        "program + shapes loads them and skips "
                        "tracing+lowering+XLA compile — on the remote-TPU "
                        "tunnel that is minutes per program. Per-machine "
                        "cache; results unchanged (failures fall back to a "
                        "normal compile). Works with the sequential driver "
                        "AND --fold-parallel (whose vmapped programs are "
                        "the most expensive compiles in the repo)")
    return p


def parse_hu_window(s):
    from multimodal_survival_prediction_tpu.utils import parse_hu_window as p

    return p(s)


def run_training(args, cfg):
    if getattr(args, "multihost", False):
        # must run before first device use (backend init); idempotent
        from multimodal_survival_prediction_tpu.parallel import (
            initialize_distributed,
        )

        initialize_distributed(coordinator=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.data import (
        generate_synthetic_cohort,
        load_matching_table,
    )
    from multimodal_survival_prediction_tpu.data.synthetic import (
        SyntheticCohortSpec,
    )
    from multimodal_survival_prediction_tpu.parallel import make_mesh
    from multimodal_survival_prediction_tpu.train.cv import (
        run_cross_validation,
    )

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )

    if args.stage1_epochs is not None and not cfg.stage1_epochs:
        raise SystemExit(
            f"--stage1-epochs only applies to two-stage models (SimMLM); "
            f"'{cfg.name}' has no stage 1")
    cfg = cfg.with_overrides(
        num_epochs=args.epochs, n_folds=args.n_folds,
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        seed=args.seed,
        stage1_epochs=args.stage1_epochs,
        ties=args.ties,
        image_shape=(tuple(int(x) for x in args.image_shape.split(","))
                     if args.image_shape else None),
    )

    root = Path(args.data_root)
    if args.synthetic:
        from multimodal_survival_prediction_tpu.data.synthetic import (
            generate_synthetic_cohort,
        )
        table, paths = generate_synthetic_cohort(
            root, SyntheticCohortSpec(n_patients=args.synthetic_patients))
        rnaseq_csv = paths["rnaseq_csv"]
    else:
        table_csv = root / "data" / "processed" / "full_matching_table.csv"
        if cfg.name == "final":
            # parity: final_multimodal reads the 109-cohort table while every
            # other trainer reads the 608-cohort one (reference
            # final_multimodal.py:205, SURVEY §2.13)
            mm = root / "data" / "processed" / "multimodal_matching_table.csv"
            if mm.exists():
                table_csv = mm
        table = load_matching_table(table_csv)
        rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"
        if not rnaseq_csv.exists():
            rnaseq_csv = None

    if getattr(args, "multihost", False):
        if args.mesh or args.fold_parallel:
            raise SystemExit(
                "--multihost builds its own global mesh over every device "
                "of every host; drop --mesh/--fold-parallel (--tp still "
                "selects tensor parallelism inside it)")
        from multimodal_survival_prediction_tpu.parallel import (
            make_global_mesh,
        )

        mesh = make_global_mesh(model_parallel=args.tp)
    else:
        mesh = (make_mesh(args.mesh, model_parallel=args.tp)
                if args.mesh else None)
    dtype = jnp.bfloat16 if args.bf16 else None

    if args.fold_dp > 1 and args.fold_parallel <= 1:
        # the inner 'data' axis only exists on a fold-parallel mesh; silently
        # training without the requested DP would mislead the user
        raise SystemExit(
            "--fold-dp needs --fold-parallel N with N > 1 (N total devices "
            "= N/M folds x M-way DP); use --mesh M for plain data "
            "parallelism with the sequential driver")

    if args.fold_parallel:
        if args.mesh or args.tp > 1 or args.resume or args.profile_dir \
                or args.sharded_risk_set:
            raise SystemExit(
                "--fold-parallel is mutually exclusive with --mesh/--tp/"
                "--resume/--profile-dir/--sharded-risk-set "
                "(use the sequential driver for those). --streaming DOES "
                "compose: host-resident cohort, stacked per-step batches "
                "(train/cv_parallel.py module docstring)")
        from multimodal_survival_prediction_tpu.train.cv_parallel import (
            make_fold_mesh,
            run_cross_validation_parallel,
        )

        payload, outcomes = run_cross_validation_parallel(
            cfg, table, rnaseq_csv=rnaseq_csv,
            results_dir=args.results_dir, models_dir=args.models_dir,
            mesh=(make_fold_mesh(args.fold_parallel,
                                 data_parallel=args.fold_dp)
                  if args.fold_parallel > 1 else None),
            backbone=args.backbone, dtype=dtype, remat=args.remat,
            use_pallas_resample=args.pallas_resample,
            hu_window=parse_hu_window(args.hu_window),
            aot_cache_dir=args.aot_cache,
            streaming=args.streaming,
        )
        print(f"\n{cfg.display_name} (fold-parallel): C-index "
              f"{payload['c_index_mean']:.4f} ± {payload['c_index_std']:.4f}")
        for o in outcomes:
            print(f"  fold {o.fold}: best {o.best_c_index:.4f} "
                  f"@ epoch {o.best_epoch} ({o.epochs_run} epochs run)")
        return payload

    payload, outcomes = run_cross_validation(
        cfg, table, rnaseq_csv=rnaseq_csv,
        results_dir=args.results_dir, models_dir=args.models_dir,
        mesh=mesh, tensor_parallel=args.tp > 1,
        backbone=args.backbone, dtype=dtype, remat=args.remat,
        use_pallas_resample=args.pallas_resample,
        hu_window=parse_hu_window(args.hu_window),
        profile_dir=args.profile_dir,
        resume=args.resume, checkpoint_every=args.checkpoint_every,
        streaming=args.streaming, sharded_risk_set=args.sharded_risk_set,
        aot_cache_dir=args.aot_cache,
    )
    print(f"\n{cfg.display_name}: C-index "
          f"{payload['c_index_mean']:.4f} ± {payload['c_index_std']:.4f}")
    for o in outcomes:
        print(f"  fold {o.fold}: best {o.best_c_index:.4f} "
              f"@ epoch {o.best_epoch} ({o.epochs_run} epochs run)")
    return payload
