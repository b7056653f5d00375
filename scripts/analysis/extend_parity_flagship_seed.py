#!/usr/bin/env python
"""Extend an existing flagship-parity run with ONE extra torch init seed.

`run_parity_flagship.py` reruns both sides for every seed; when the only
question is "does the JAX mean fall inside the torch oracle's own init-seed
spread?", rerunning the JAX side (and the already-recorded torch seeds) is
wasted single-core hours. This one-off loads the SAME cohort (the synthetic
generator is deterministic, data/synthetic.py seed=42, so --data-root may be
a preserved tempdir or a fresh regeneration — both are bit-identical), runs
the torch oracle once at --seed, and patches the tagged JSON's
`torch.cv_mean_per_init_seed` plus the seed-spread paragraph in
PARITY_TWIN_FLAGSHIP.md.

Run CPU-only (the torch oracle is CPU; keep the TPU tunnel idle):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
      scripts/analysis/extend_parity_flagship_seed.py \
      --tag 64x64x32-reference-shape --seed 44 --epochs 15 --n-folds 2 \
      --image-shape 64,64,32 --data-root /tmp/parity_flagship_0ixzds8v
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import re
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tag", required=True)
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--n-folds", type=int, required=True)
    p.add_argument("--n-patients", type=int, default=128)
    p.add_argument("--image-shape", default="64,64,32")
    p.add_argument("--data-root", default=None)
    p.add_argument("--out-dir", default=str(REPO_ROOT))
    args = p.parse_args()

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
    from multimodal_survival_prediction_tpu.train.cv import prepare_cv_data

    image_shape = tuple(int(x) for x in args.image_shape.split(","))
    if args.data_root:
        root = Path(args.data_root)
    else:
        root = Path(tempfile.mkdtemp(prefix="parity_flagship_"))
        generate_synthetic_cohort(
            root, SyntheticCohortSpec(
                n_patients=args.n_patients, p_imaging=0.6,
                image_shapes=((40, 48, 48), (36, 40, 40))))

    table = load_matching_table(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"
    cfg = dataclasses.replace(PARTIAL_MODALITY, n_folds=args.n_folds,
                              image_shape=image_shape)
    arrays, _ = prepare_cv_data(cfg, table, rnaseq_csv=rnaseq_csv)

    t0 = time.monotonic()
    folds = run_torch_partial_modality_cv(
        arrays.arrays, n_folds=cfg.n_folds, num_epochs=args.epochs,
        batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        gate_entropy_weight=cfg.gate_entropy_weight,
        patience=cfg.patience, grad_clip=cfg.grad_clip,
        seed=args.seed, split_seed=cfg.seed)
    sec = time.monotonic() - t0
    mean = round(float(np.mean([f["best_c_index"] for f in folds])), 4)
    print(f"[extend-parity] torch seed {args.seed}: CV mean {mean:.4f} "
          f"({sec:.0f}s)")

    out_dir = Path(args.out_dir)
    jpath = out_dir / f"parity_flagship_results_{args.tag}.json"
    payload = json.loads(jpath.read_text())
    payload["torch"]["cv_mean_per_init_seed"][str(args.seed)] = mean
    seed_means = {int(s): m
                  for s, m in payload["torch"]["cv_mean_per_init_seed"].items()}
    j_mean = payload["jax"]["c_index_mean"]
    spread = max(seed_means.values()) - min(seed_means.values())
    inside = (min(seed_means.values()) - 1e-9 <= j_mean
              <= max(seed_means.values()) + 1e-9)

    para = (
        "Torch oracle CV mean at different init seeds (identical splits): "
        + ", ".join(f"seed {s}: {m:.4f}" for s, m in sorted(seed_means.items()))
        + f" — seed-to-seed spread {spread:.4f}. The JAX mean ({j_mean:.4f}) "
        + ("falls INSIDE the oracle's own seed range."
           if inside else
           "falls outside the oracle's seed range by "
           f"{min(abs(j_mean - m) for m in seed_means.values()):.4f}.")
    )
    md = out_dir / "PARITY_TWIN_FLAGSHIP.md"
    text = md.read_text()
    # Validate BOTH patches before writing EITHER file: a missing/renamed
    # tagged section must not leave the JSON recording a seed the markdown
    # narrative does not mention.
    heading = f"## {args.tag} run (appended)"
    sec_start = text.find(heading)
    if sec_start < 0:
        raise SystemExit(f"tagged section {heading!r} not found in "
                         "PARITY_TWIN_FLAGSHIP.md; nothing written")
    section = text[sec_start:]
    new_section, n = re.subn(
        r"Torch oracle CV mean at different init seeds[^\n]*\n",
        para + "\n", section, count=1)
    if n != 1:
        raise SystemExit("seed-spread paragraph not found in tagged section; "
                         "nothing written")
    jpath.write_text(json.dumps(payload, indent=2))
    md.write_text(text[:sec_start] + new_section)
    print(f"[extend-parity] patched {jpath.name} + PARITY_TWIN_FLAGSHIP.md: "
          f"{para}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
