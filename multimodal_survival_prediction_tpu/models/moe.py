"""SimMLM: dynamic mixture of modality experts + per-expert Cox heads.

Reference generate_km_curves.py:160-281 ("SimMLM (Dynamic Mixture of Modality
Experts + MoFe Loss)"). Three ModalityExperts each with their own cox head;
a GatingNetwork with masked softmax (logits of missing modalities filled with
-inf before softmax, reference :241-242); fused feature = gate-weighted sum;
ensemble cox head. Forward returns
(ensemble_hazard, expert_hazards(B,3 in [image,rnaseq,clinical] order),
 gate_weights).

Two-stage training schedule (stage1 30 + stage2 50 epochs, mofe_lambda=0.1)
comes from results/simmim/cv_results.json hyperparameters — the training
script is absent from the reference (SURVEY §2.4 build note).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoders import ImageEncoder
from .layers import MLPBlock, TorchLinear


class _RNAExpert(nn.Module):
    out_features: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = MLPBlock(512, dropout=0.3, train=train, dtype=self.dtype,
                     name="block0")(x)
        return nn.relu(
            TorchLinear(self.out_features, dtype=self.dtype, name="proj")(x))


class _ClinicalExpert(nn.Module):
    out_features: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.relu(TorchLinear(64, dtype=self.dtype, name="fc0")(x))
        return nn.relu(
            TorchLinear(self.out_features, dtype=self.dtype, name="fc1")(x))


class GatingNetwork(nn.Module):
    """MLP(3*feat+3 -> 128 -> 64 -> 3) with Dropout(0.2) after the first ReLU
    and masked softmax over available modalities."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, concat_feat, mask, *, train: bool = False):
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc0")(concat_feat))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.relu(TorchLinear(64, dtype=self.dtype, name="fc1")(x))
        logits = TorchLinear(3, dtype=self.dtype, name="fc2")(x)
        # Finite fill, not -inf: for rows with >=1 available modality the
        # masked entries still underflow to exactly 0 after softmax
        # (exp(-1e30 - max) == 0 in f32), but an ALL-missing row would make
        # softmax(-inf,-inf,-inf) = NaN — and one NaN hazard poisons the
        # whole batch's Cox cumlogsumexp. Such rows are plausible in the
        # real cohort (labeled patient with no CT, no RNA, no age).
        logits = jnp.where(mask == 0, -1e30, logits)
        gates = nn.softmax(logits, axis=-1)
        # all-missing row: zero the gates so the fused feature / ensemble
        # hazard is a constant for that patient instead of uniform garbage
        has_any = jnp.sum(mask, axis=-1, keepdims=True) > 0
        return jnp.where(has_any, gates, 0.0)


class SimMLMSurvivalNet(nn.Module):
    feature_dim: int = 128
    backbone: str = "densenet121"
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image, rnaseq, clinical, mask, *, train: bool = False):
        feat_img = ImageEncoder(self.feature_dim, backbone=self.backbone, remat=self.remat,
                                dtype=self.dtype, name="expert_image")(
            image, train=train)
        feat_rna = _RNAExpert(self.feature_dim, dtype=self.dtype,
                              name="expert_rnaseq")(rnaseq, train=train)
        feat_clin = _ClinicalExpert(self.feature_dim, dtype=self.dtype,
                                    name="expert_clinical")(
            clinical, train=train)

        # Per-expert cox heads see the *unmasked* features (reference
        # ModalityExpert.forward computes hazard before SimMLM masks feats).
        h_img = TorchLinear(1, dtype=self.dtype, name="cox_image")(
            feat_img).squeeze(-1)
        h_rna = TorchLinear(1, dtype=self.dtype, name="cox_rnaseq")(
            feat_rna).squeeze(-1)
        h_clin = TorchLinear(1, dtype=self.dtype, name="cox_clinical")(
            feat_clin).squeeze(-1)

        feat_img = feat_img * mask[:, 0:1]
        feat_rna = feat_rna * mask[:, 1:2]
        feat_clin = feat_clin * mask[:, 2:3]

        concat = jnp.concatenate([feat_img, feat_rna, feat_clin, mask], axis=-1)
        gate_weights = GatingNetwork(dtype=self.dtype, name="gating")(
            concat, mask, train=train)

        fused = (
            gate_weights[:, 0:1] * feat_img
            + gate_weights[:, 1:2] * feat_rna
            + gate_weights[:, 2:3] * feat_clin
        )
        ensemble_hazard = TorchLinear(1, dtype=self.dtype, name="ensemble_cox")(
            fused).squeeze(-1)

        expert_hazards = jnp.stack([h_img, h_rna, h_clin], axis=-1)  # (B, 3)
        return ensemble_hazard, expert_hazards, gate_weights
