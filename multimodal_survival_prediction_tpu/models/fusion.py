"""Late-fusion survival models.

SimpleFusionModel       — reference simple_fusion.py:160-236
FlexibleMultimodalModel — reference flexible_multimodal.py:157-256
MultiModalSurvivalNet   — reference final_multimodal.py:59-150
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoders import (
    ClinicalEncoder,
    ImageEncoder,
    RNAEncoderCompact,
    RNAEncoderDeep,
)
from .layers import MLPBlock, TorchLinear


class _FusionHead(nn.Module):
    """Linear->BN->ReLU->Drop(0.3) -> Linear->ReLU->Drop(0.2) -> Linear(1).
    (reference simple_fusion.py:206-215)"""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = MLPBlock(256, dropout=0.3, train=train, dtype=self.dtype,
                     name="block0")(x)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="linear1")(x))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return TorchLinear(1, dtype=self.dtype, name="out")(x).squeeze(-1)


class SimpleFusionModel(nn.Module):
    """RNA (deep enc, 256) + image (128) -> fusion head -> log-hazard."""

    img_feature_dim: int = 128
    rna_feature_dim: int = 256
    backbone: str = "densenet121"
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image, rnaseq, *, train: bool = False):
        rna_feat = RNAEncoderDeep(self.rna_feature_dim, dtype=self.dtype,
                                  name="rna_encoder")(rnaseq, train=train)
        img_feat = ImageEncoder(self.img_feature_dim, backbone=self.backbone, remat=self.remat,
                                dtype=self.dtype, name="image_encoder")(
            image, train=train)
        fused = jnp.concatenate([rna_feat, img_feat], axis=-1)
        return _FusionHead(dtype=self.dtype, name="fusion")(fused, train=train)


class FlexibleMultimodalModel(nn.Module):
    """SimpleFusion + learnable missing-modality bias vectors:
    feature = feat*mask + bias*(1-mask)  (reference flexible_multimodal.py:
    205-206, :249-250). Bias params initialized ~N(0,1) like torch.randn."""

    img_feature_dim: int = 128
    rna_feature_dim: int = 256
    backbone: str = "densenet121"
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image, rnaseq, mask, *, train: bool = False):
        img_feat = ImageEncoder(self.img_feature_dim, backbone=self.backbone, remat=self.remat,
                                dtype=self.dtype, name="image_encoder")(
            image, train=train)
        rna_feat = RNAEncoderDeep(self.rna_feature_dim, dtype=self.dtype,
                                  name="rna_encoder")(rnaseq, train=train)

        missing_img = self.param(
            "missing_image_bias", nn.initializers.normal(1.0),
            (self.img_feature_dim,))
        missing_rna = self.param(
            "missing_rna_bias", nn.initializers.normal(1.0),
            (self.rna_feature_dim,))

        img_m = mask[:, 0:1]
        rna_m = mask[:, 1:2]
        img_feat = img_feat * img_m + missing_img[None, :] * (1 - img_m)
        rna_feat = rna_feat * rna_m + missing_rna[None, :] * (1 - rna_m)

        fused = jnp.concatenate([img_feat, rna_feat], axis=-1)
        return _FusionHead(dtype=self.dtype, name="fusion")(fused, train=train)


class MultiModalSurvivalNet(nn.Module):
    """CT(128) + RNA compact(128) + clinical(32) -> fusion 288->256->128 ->
    cox head (reference final_multimodal.py:59-150). No masking/gating."""

    backbone: str = "densenet121"
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ct, rna, clinical, *, train: bool = False):
        ct_feat = ImageEncoder(128, backbone=self.backbone, remat=self.remat, dtype=self.dtype,
                               name="ct_encoder")(ct, train=train)
        rna_feat = RNAEncoderCompact(128, dtype=self.dtype,
                                     name="rna_encoder")(rna, train=train)
        clin_feat = ClinicalEncoder(32, dtype=self.dtype,
                                    name="clinical_encoder")(clinical)

        fused = jnp.concatenate([ct_feat, rna_feat, clin_feat], axis=-1)
        fused = MLPBlock(256, dropout=0.3, train=train, dtype=self.dtype,
                         name="fusion_block")(fused)
        fused = nn.relu(
            TorchLinear(128, dtype=self.dtype, name="fusion_proj")(fused))
        return TorchLinear(1, dtype=self.dtype, name="cox_head")(
            fused).squeeze(-1)
