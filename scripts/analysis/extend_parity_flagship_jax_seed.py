#!/usr/bin/env python
"""Extend an existing flagship-parity run with ONE extra JAX init seed.

The torch oracle's init-seed spread is already recorded
(extend_parity_flagship_seed.py); this is the mirror image for the JAX side:
run THIS framework's CV driver at another init seed on the SAME cohort and
bit-identical seed-42 fold splits, so the parity narrative can compare the
two init-seed DISTRIBUTIONS instead of one JAX point against a torch range.

Split identity: `prepare_cv_data` runs at the canonical cfg.seed=42 and its
`prepared` (arrays, splits) is passed through to `run_cross_validation`
while the config's seed — which drives Trainer init/dropout/shuffle — is
overridden, exactly the init-vs-split separation the torch twin exposes as
(seed, split_seed).

Run on the TPU (the recorded seed-42 JAX side ran there; a 64x64x32
DenseNet CV on this host's single CPU core exceeds 40 min/seed), with the
host otherwise idle:
  python scripts/analysis/extend_parity_flagship_jax_seed.py \
      --tag 64x64x32-reference-shape --seeds 43,44,45 --epochs 15 \
      --n-folds 2 --image-shape 64,64,32 \
      --data-root /tmp/parity_flagship_0ixzds8v
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
    import logging
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tag", required=True)
    p.add_argument("--seeds", required=True,
                   help="comma-separated init seeds (one process runs all,"
                        " amortizing the cohort build)")
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--n-folds", type=int, required=True)
    p.add_argument("--n-patients", type=int, default=128)
    p.add_argument("--image-shape", default="64,64,32")
    p.add_argument("--data-root", default=None)
    p.add_argument("--out-dir", default=str(REPO_ROOT))
    args = p.parse_args()

    import numpy as np

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

    table = load_matching_table(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"
    cfg = dataclasses.replace(PARTIAL_MODALITY, n_folds=args.n_folds,
                              image_shape=image_shape)
    prepared = prepare_cv_data(cfg, table, rnaseq_csv=rnaseq_csv)

    for seed in (int(x) for x in args.seeds.split(",")):
        jcfg = dataclasses.replace(cfg, seed=seed)
        t0 = time.monotonic()
        _, outcomes = run_cross_validation(
            jcfg, table, rnaseq_csv=rnaseq_csv, num_epochs=args.epochs,
            write_outputs=False, prepared=prepared)
        sec = time.monotonic() - t0
        mean = round(float(np.mean([o.best_c_index for o in outcomes])), 4)
        print(f"[extend-parity-jax] jax seed {seed}: CV mean {mean:.4f} "
              f"({sec:.0f}s)", flush=True)
        _patch(Path(args.out_dir), args.tag, cfg.seed, seed, mean)
    return 0


def _patch(out_dir, tag, base_seed, seed, mean):
    import json
    import re

    jpath = out_dir / f"parity_flagship_results_{tag}.json"
    payload = json.loads(jpath.read_text())
    seed_means = payload["jax"].setdefault(
        "cv_mean_per_init_seed",
        {str(base_seed): payload["jax"]["c_index_mean"]})
    seed_means[str(seed)] = mean
    j_means = {int(s): m for s, m in seed_means.items()}
    t_means = {int(s): m
               for s, m in payload["torch"]["cv_mean_per_init_seed"].items()}
    overlap = (min(j_means.values()) <= max(t_means.values()) + 1e-9
               and max(j_means.values()) >= min(t_means.values()) - 1e-9)

    para = (
        "JAX build CV mean at different init seeds (identical splits): "
        + ", ".join(f"seed {s}: {m:.4f}" for s, m in sorted(j_means.items()))
        + f" — JAX seed-to-seed spread "
        f"{max(j_means.values()) - min(j_means.values()):.4f}. The JAX and "
        "torch init-seed ranges "
        + ("OVERLAP: the two implementations' seed distributions are "
           "statistically indistinguishable at this cohort size."
           if overlap else
           "do not overlap at the seeds sampled so far.")
    )
    md = out_dir / "PARITY_TWIN_FLAGSHIP.md"
    text = md.read_text()
    # Validate BOTH patches before writing EITHER file (same contract as
    # extend_parity_flagship_seed.py).
    heading = f"## {tag} run (appended)"
    sec_start = text.find(heading)
    if sec_start < 0:
        raise SystemExit(f"tagged section {heading!r} not found in "
                         "PARITY_TWIN_FLAGSHIP.md; nothing written")
    section = text[sec_start:]
    if "JAX build CV mean at different init seeds" in section:
        new_section, n = re.subn(
            r"JAX build CV mean at different init seeds[^\n]*\n",
            para + "\n", section, count=1)
        if n != 1:
            raise SystemExit("JAX seed paragraph not replaceable; "
                             "nothing written")
    else:
        # insert right after the torch seed-spread paragraph
        m = re.search(
            r"Torch oracle CV mean at different init seeds[^\n]*\n", section)
        if m is None:
            raise SystemExit("torch seed-spread paragraph not found in "
                             "tagged section; nothing written")
        new_section = (section[:m.end()] + "\n" + para + "\n"
                       + section[m.end():])
    jpath.write_text(json.dumps(payload, indent=2))
    md.write_text(text[:sec_start] + new_section)
    print(f"[extend-parity-jax] patched {jpath.name} + "
          f"PARITY_TWIN_FLAGSHIP.md: {para}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
