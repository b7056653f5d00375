#!/usr/bin/env python
"""Export a framework fold checkpoint (.msgpack) to a reference-layout torch
``.pth`` state_dict — the inverse of convert_torch_checkpoint.py.

A model trained HERE can be handed back to torch tooling: the emitted file
loads into the reference's own model classes with
``load_state_dict(strict=True)`` (MONAI DenseNet121 key layout for
DenseNet-backbone checkpoints, incl. its ``.layers.`` nesting).

  python scripts/tools/export_torch_checkpoint.py \\
      --checkpoint models/partial_modality/fold_1_best.msgpack \\
      --out fold_1_best.pth

Model family / backbone / rna_dim / image shape come from the checkpoint's
``.meta.json`` (written by the CV drivers and by convert_torch_checkpoint);
override with flags when exporting a pre-metadata checkpoint.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help=".msgpack path")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--model", default=None,
                   help="model family (default: from .meta.json)")
    p.add_argument("--backbone", default=None)
    p.add_argument("--rna-dim", type=int, default=None)
    p.add_argument("--image-shape", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_survival_prediction_tpu.config import ALL_CONFIGS
    from multimodal_survival_prediction_tpu.io.checkpoint import (
        load_checkpoint,
        load_fold_meta,
    )
    from multimodal_survival_prediction_tpu.io.torch_import import (
        export_torch_state_dict,
    )
    from multimodal_survival_prediction_tpu.train.adapters import (
        make_model_and_adapters,
    )

    meta = load_fold_meta(args.checkpoint) or {}
    model_name = args.model or meta.get("model")
    if not model_name:
        raise SystemExit("--model required (no .meta.json beside checkpoint)")
    backbone = args.backbone or meta.get("backbone") or "densenet121"
    rna_dim = int(args.rna_dim or meta.get("rna_dim") or 5005)
    image_shape = tuple(
        int(x) for x in args.image_shape.split(",")) if args.image_shape \
        else tuple(meta.get("image_shape") or (64, 64, 32))

    cfg = ALL_CONFIGS[model_name]
    model, batch_to_inputs, _ = make_model_and_adapters(cfg,
                                                        backbone=backbone)
    b = {"image": jnp.zeros((1, *image_shape, 1), jnp.float32),
         "rnaseq": jnp.zeros((1, rna_dim), jnp.float32),
         "clinical": jnp.zeros((1, 1), jnp.float32),
         "mask": jnp.ones((1, 3), jnp.float32),
         "time": jnp.zeros((1,), jnp.float32),
         "event": jnp.zeros((1,), jnp.float32),
         "svalid": jnp.ones((1,), jnp.float32),
         "valid": jnp.ones((1,), jnp.float32)}
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           *batch_to_inputs(b), train=False))
    target = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                    dict(shapes))
    restored = load_checkpoint(args.checkpoint, {
        "params": target["params"],
        "batch_stats": target.get("batch_stats", {})})
    sd = export_torch_state_dict(model_name, {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"]})

    import torch

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) if getattr(
        v, "ndim", 0) else torch.tensor(v) for k, v in sd.items()}, out)
    print(f"[export-torch] wrote {out}: model={model_name} "
          f"backbone={backbone} ({len(sd)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
