"""Checkpointing: best-by-val-C-index per fold (reference semantics) with
full-state save/restore the reference lacks (SURVEY §5: no resume, no
optimizer state in the reference — we keep its best-checkpoint behavior and
add proper resume on top).

Two backends:
  * msgpack (flax.serialization) — single file, no extra deps, default.
  * orbax — directory-based, async-capable, for large states.
"""

from __future__ import annotations

from pathlib import Path

import jax
from flax import serialization


def save_checkpoint(path, state_tree) -> None:
    """Serialize a pytree (params or full TrainState) to one msgpack file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state_tree = jax.device_get(state_tree)
    path.write_bytes(serialization.to_bytes(state_tree))


def load_checkpoint(path, target_tree):
    """Restore into the structure of `target_tree`."""
    return serialization.from_bytes(target_tree, Path(path).read_bytes())


def save_checkpoint_orbax(path, state_tree) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), jax.device_get(state_tree))


def load_checkpoint_orbax(path, target_tree):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), target_tree)


def save_fold_meta(ckpt_path, **meta) -> None:
    """Write `<ckpt>.meta.json` beside a fold checkpoint — the training-time
    facts scoring tools must match (backbone, image_shape, hu_window,
    rna_dim, ties, ...). A checkpoint that describes itself kills a silent
    footgun class: loading simple_cnn weights into a DenseNet tree fails
    loudly, but a mismatched hu_window or image_shape would just skew risks.
    """
    import json

    p = Path(str(ckpt_path) + ".meta.json")
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(meta, indent=2, default=str))


def load_fold_meta(ckpt_path) -> dict | None:
    """The `.meta.json` beside a checkpoint, or None (pre-metadata runs)."""
    import json

    p = Path(str(ckpt_path) + ".meta.json")
    return json.loads(p.read_text()) if p.exists() else None
