"""Gated partial-modality network — the flagship model.

Reference partial_modality_training.py:165-277: encoders run on zero-filled
inputs for missing modalities, features are then zero-masked (:256-259), a
gate MLP over [features ‖ mask] softmaxes to 3 modality weights (:213-218,
:262-263), gate-weighted features are fused, and a Cox head emits the
log-hazard. Returns (hazard, gate_weights).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoders import ClinicalEncoder, ImageEncoder, RNAEncoderCompact
from .layers import MLPBlock, TorchLinear


class PartialModalityNet(nn.Module):
    backbone: str = "densenet121"
    remat: bool = False
    dtype: jnp.dtype | None = None
    # None = full DenseNet121 blocks; shorter configs shrink the CT encoder
    # for small inputs (tests, tiny cohorts)
    block_config: tuple | None = None
    trunk: str = "concat"  # DenseNet concat-trunk strategy (densenet3d.py)
    # fused Pallas norm1->relu->conv1; int = max-rows threshold (densenet3d.py)
    fused_bn1: bool | int = False

    @nn.compact
    def __call__(self, ct, rna, clinical, mask, *, train: bool = False):
        # Encoders run on the (possibly zero) inputs FIRST; masking is applied
        # to features afterwards — this ordering matters for BatchNorm
        # statistics and is reproduced deliberately (SURVEY §7 hard parts).
        ct_feat = ImageEncoder(128, backbone=self.backbone, remat=self.remat,
                               dtype=self.dtype,
                               block_config=self.block_config,
                               trunk=self.trunk, fused_bn1=self.fused_bn1,
                               name="ct_encoder")(ct, train=train)
        rna_feat = RNAEncoderCompact(128, dtype=self.dtype,
                                     name="rna_encoder")(rna, train=train)
        clin_feat = ClinicalEncoder(32, dtype=self.dtype,
                                    name="clinical_encoder")(clinical)

        ct_feat = ct_feat * mask[:, 0:1]
        rna_feat = rna_feat * mask[:, 1:2]
        clin_feat = clin_feat * mask[:, 2:3]

        concat = jnp.concatenate([ct_feat, rna_feat, clin_feat, mask], axis=-1)
        g = nn.relu(TorchLinear(64, dtype=self.dtype, name="gate0")(concat))
        g = TorchLinear(3, dtype=self.dtype, name="gate1")(g)
        gate_weights = nn.softmax(g, axis=-1)

        fused = jnp.concatenate(
            [
                ct_feat * gate_weights[:, 0:1],
                rna_feat * gate_weights[:, 1:2],
                clin_feat * gate_weights[:, 2:3],
            ],
            axis=-1,
        )
        fused = MLPBlock(256, dropout=0.3, train=train, dtype=self.dtype,
                         name="fusion_block")(fused)
        fused = nn.relu(
            TorchLinear(128, dtype=self.dtype, name="fusion_proj")(fused))
        hazard = TorchLinear(1, dtype=self.dtype, name="cox_head")(
            fused).squeeze(-1)
        return hazard, gate_weights
