"""Modality encoders shared by the fusion model family.

Three RNA encoder variants exist in the reference:
  * deep (5005 -> 1024 -> 512 -> 256): simple_fusion.py:167-179 /
    flexible_multimodal.py:190-202
  * compact (5005 -> 512 -> 128): final_multimodal.py:94-101 /
    partial_modality_training.py:195-202
Clinical encoder: Linear(1 -> 32) + ReLU (final_multimodal.py:104-107), or
the two-layer 1 -> 64 -> 128 expert in SimMLM (generate_km_curves.py:200-206).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .densenet3d import DenseNet121_3D
from .layers import BatchNorm, MLPBlock, TorchConv, TorchLinear


class RNAEncoderDeep(nn.Module):
    """5005 -> 1024 -> 512 -> rna_feature_dim(256), final ReLU, no final BN."""

    out_features: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = MLPBlock(1024, dropout=0.3, train=train, dtype=self.dtype,
                     name="block0")(x)
        x = MLPBlock(512, dropout=0.3, train=train, dtype=self.dtype,
                     name="block1")(x)
        x = TorchLinear(self.out_features, dtype=self.dtype, name="proj")(x)
        return nn.relu(x)


class RNAEncoderCompact(nn.Module):
    """5005 -> 512 (BN+ReLU+Drop0.3) -> out(128), final ReLU."""

    out_features: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = MLPBlock(512, dropout=0.3, train=train, dtype=self.dtype,
                     name="block0")(x)
        x = TorchLinear(self.out_features, dtype=self.dtype, name="proj")(x)
        return nn.relu(x)


class ClinicalEncoder(nn.Module):
    """Linear(clinical_dim -> 32) + ReLU."""

    out_features: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return nn.relu(
            TorchLinear(self.out_features, dtype=self.dtype, name="proj")(x)
        )


class SimpleCNN3D(nn.Module):
    """The reference's MONAI-less fallback CT encoder: three stride-2 conv
    blocks + global average pool (e.g. partial_modality_training.py:179-191).
    Channels-last input (B, D, H, W, 1) -> (B, out_features)."""

    out_features: int = 128
    widths: tuple = (32, 64)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i, w in enumerate((*self.widths, self.out_features)):
            x = TorchConv(w, (3, 3, 3), strides=2, padding=[(1, 1)] * 3,
                          dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name=f"bn{i}")(x)
            x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2, 3))


class ImageEncoder(nn.Module):
    """CT encoder: DenseNet121-3D (default, = reference USE_MONAI path) or the
    simple CNN fallback. Returns (B, out_features)."""

    out_features: int = 128
    backbone: str = "densenet121"  # or "simple_cnn"
    remat: bool = False
    dtype: jnp.dtype | None = None
    # None = DenseNet121's (6, 12, 24, 16); shorter configs for small data /
    # tests (fewer halvings -> smaller minimum input)
    block_config: tuple | None = None
    trunk: str = "concat"  # concat-trunk strategy (densenet3d.py docstring)
    # fused Pallas norm1->relu->conv1; int = max-rows threshold (densenet3d.py)
    fused_bn1: bool | int = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.backbone == "densenet121":
            kwargs = ({"block_config": self.block_config}
                      if self.block_config is not None else {})
            return DenseNet121_3D(
                out_features=self.out_features, remat=self.remat,
                dtype=self.dtype, trunk=self.trunk,
                fused_bn1=self.fused_bn1, name="densenet", **kwargs,
            )(x, train=train)
        return SimpleCNN3D(
            out_features=self.out_features, dtype=self.dtype, name="cnn",
        )(x, train=train)
