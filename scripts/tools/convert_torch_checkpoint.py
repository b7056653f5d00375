#!/usr/bin/env python
"""Convert a reference torch ``.pth`` fold checkpoint into this framework's
checkpoint format (.msgpack + self-describing .meta.json).

Migration path for reference users: the reference saves
``torch.save(model.state_dict(), 'models/<name>/fold_K_best.pth')``
(reference partial_modality_training.py:556, train_rnaseq_only.py:286).
Convert those files once and every scoring tool here — ``predict_risk``,
the serving ``RiskScorer``, ``generate_km_curves.py`` — consumes them
directly, no retraining:

  python scripts/tools/convert_torch_checkpoint.py \\
      --model partial_modality \\
      --torch-checkpoint models/partial_modality/fold_1_best.pth \\
      --out models_tpu/partial_modality/fold_1_best.msgpack \\
      --image-shape 64,64,32

Supported: every reference family with an upstream state_dict layout —
rnaseq_only, partial_modality, simple_fusion, flexible_multimodal, final,
image_only, simmim (mmsurv has no reference implementation). Image families
accept BOTH CT backbones (MONAI DenseNet121 and the MONAI-less simple-CNN
fallback, auto-detected from the keys). The import is validated structurally
against a real model init before anything is written.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["rnaseq_only", "partial_modality",
                            "simple_fusion", "flexible_multimodal", "final",
                            "image_only", "simmim"])
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--out", required=True,
                   help="output .msgpack path (.meta.json written beside it)")
    p.add_argument("--backbone", default=None,
                   choices=[None, "densenet121", "simple_cnn"],
                   help="CT backbone (default: auto-detect from the keys)")
    p.add_argument("--image-shape", default="64,64,32",
                   help="training-time CT shape to record in .meta.json "
                        "(the reference flagship used 64,64,32)")
    p.add_argument("--hu-window", default=None,
                   help="a,b HU window if the torch run windowed CTs")
    args = p.parse_args()

    import numpy as np  # noqa: F401  (jax deps resolve after sys.path)

    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
    from multimodal_survival_prediction_tpu.io.checkpoint import (
        save_checkpoint,
        save_fold_meta,
    )
    from multimodal_survival_prediction_tpu.io.torch_import import (
        import_torch_checkpoint,
        validate_against_model,
    )
    from multimodal_survival_prediction_tpu.train.adapters import (
        make_model_and_adapters,
    )

    variables, backbone = import_torch_checkpoint(
        args.model, args.torch_checkpoint, backbone=args.backbone)

    # rna_dim straight from the imported weights (flax kernel is (in, out))
    p_ = variables["params"]
    if args.model == "rnaseq_only":
        rna_dim = p_["block0"]["linear"]["dense"]["kernel"].shape[0]
    elif args.model == "image_only":
        rna_dim = 5005  # image_only consumes no RNA; record the default
    elif args.model == "simmim":
        rna_dim = p_["expert_rnaseq"]["block0"]["linear"]["dense"][
            "kernel"].shape[0]
    else:
        rna_dim = p_["rna_encoder"]["block0"]["linear"]["dense"][
            "kernel"].shape[0]
    rna_dim = int(rna_dim)

    image_shape = tuple(int(x) for x in args.image_shape.split(","))
    hu_window = (tuple(float(x) for x in args.hu_window.split(","))
                 if args.hu_window else None)

    cfg = ALL_CONFIGS[args.model]
    model, batch_to_inputs, _ = make_model_and_adapters(
        cfg, rna_dim=int(rna_dim), backbone=backbone or "densenet121")
    import jax.numpy as jnp
    example = {
        "image": jnp.zeros((1, *image_shape, 1), jnp.float32),
        "rnaseq": jnp.zeros((1, int(rna_dim)), jnp.float32),
        "clinical": jnp.zeros((1, 1), jnp.float32),
        "mask": jnp.ones((1, 3), jnp.float32),
        "time": jnp.zeros((1,), jnp.float32),
        "event": jnp.zeros((1,), jnp.float32),
        "svalid": jnp.ones((1,), jnp.float32),
        "valid": jnp.ones((1,), jnp.float32),
    }
    validate_against_model(variables, model, batch_to_inputs(example))

    out = Path(args.out)
    save_checkpoint(out, variables)
    save_fold_meta(
        out, model=args.model, backbone=backbone,
        image_shape=list(image_shape), rna_dim=int(rna_dim),
        hu_window=(list(hu_window) if hu_window else None),
        use_pallas_resample=False, ties="breslow",
        imported_from=str(args.torch_checkpoint))
    print(f"[convert-torch] wrote {out} (+.meta.json): model={args.model} "
          f"backbone={backbone} rna_dim={int(rna_dim)} "
          f"image_shape={image_shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
