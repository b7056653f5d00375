"""MMsurv: Compact Bilinear Pooling + Transformer multi-scale fusion.

The reference ships NO code for this model — it exists only as metadata
(reference final_comparison.py:287-288, comprehensive_analysis.py:322,
results/mmsurv/cv_results.json: bs=8, lr=1e-3, wd=1e-4, dropout=0.5,
3 folds). This is therefore a from-scratch design faithful to that
description:

  * modality encoders -> per-modality feature tokens (image/RNA/clinical)
  * Compact Bilinear Pooling (count-sketch + FFT, Gao et al. 2016) of the
    image and RNA features to capture multiplicative interactions
  * a small transformer encoder over the [img, rna, clin, cbp] token sequence
    (multi-scale fusion), masked by modality availability
  * mean-pooled tokens -> Cox head.

Count-sketch projections use fixed (non-learned) hash/sign patterns derived
from a seed so the module is a pure function of its params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encoders import ClinicalEncoder, ImageEncoder, RNAEncoderCompact
from .layers import TorchLinear


def _count_sketch_matrix(dim_in: int, dim_out: int, seed: int) -> np.ndarray:
    """Sparse sketch as a dense (dim_in, dim_out) matrix (dims are small)."""
    rng = np.random.default_rng(seed)
    h = rng.integers(0, dim_out, size=dim_in)
    s = rng.choice([-1.0, 1.0], size=dim_in)
    m = np.zeros((dim_in, dim_out), np.float32)
    m[np.arange(dim_in), h] = s
    return m


class CompactBilinearPooling(nn.Module):
    """CBP(x, y) = IFFT(FFT(sketch_x(x)) * FFT(sketch_y(y)))."""

    dim_out: int = 256

    @nn.compact
    def __call__(self, x, y):
        mx = self.variable(
            "constants", "sketch_x",
            lambda: jnp.asarray(_count_sketch_matrix(x.shape[-1],
                                                     self.dim_out, 1)),
        ).value
        my = self.variable(
            "constants", "sketch_y",
            lambda: jnp.asarray(_count_sketch_matrix(y.shape[-1],
                                                     self.dim_out, 2)),
        ).value
        fx = jnp.fft.rfft(x.astype(jnp.float32) @ mx, axis=-1)
        fy = jnp.fft.rfft(y.astype(jnp.float32) @ my, axis=-1)
        out = jnp.fft.irfft(fx * fy, n=self.dim_out, axis=-1)
        # signed sqrt + l2 normalize (standard CBP post-processing)
        out = jnp.sign(out) * jnp.sqrt(jnp.abs(out) + 1e-8)
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)


class TransformerBlock(nn.Module):
    dim: int
    heads: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, tokens, pad_mask, *, train: bool = False):
        # pad_mask: (B, T) 1=real token
        attn_mask = pad_mask[:, None, None, :] > 0  # (B,1,1,T)
        y = nn.LayerNorm(name="ln1")(tokens)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout,
            deterministic=not train, name="attn",
        )(y, y, mask=attn_mask)
        tokens = tokens + y
        y = nn.LayerNorm(name="ln2")(tokens)
        y = nn.relu(TorchLinear(self.dim * 2, name="ff0")(y))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = TorchLinear(self.dim, name="ff1")(y)
        return tokens + y


class MMsurvNet(nn.Module):
    token_dim: int = 128
    cbp_dim: int = 256
    num_layers: int = 2
    dropout: float = 0.5
    backbone: str = "densenet121"
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image, rnaseq, clinical, mask, *, train: bool = False):
        img = ImageEncoder(self.token_dim, backbone=self.backbone, remat=self.remat,
                           dtype=self.dtype, name="image_encoder")(
            image, train=train)
        rna = RNAEncoderCompact(self.token_dim, dtype=self.dtype,
                                name="rna_encoder")(rnaseq, train=train)
        clin = ClinicalEncoder(self.token_dim, dtype=self.dtype,
                               name="clinical_encoder")(clinical)

        cbp = CompactBilinearPooling(self.cbp_dim, name="cbp")(img, rna)
        cbp_tok = TorchLinear(self.token_dim, name="cbp_proj")(cbp)

        tokens = jnp.stack([img, rna, clin, cbp_tok], axis=1)  # (B,4,D)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 4, self.token_dim))
        tokens = tokens + pos
        # token validity: cbp token requires both image and rna
        cbp_valid = mask[:, 0:1] * mask[:, 1:2]
        pad_mask = jnp.concatenate([mask, cbp_valid], axis=-1)  # (B,4)
        tokens = tokens * pad_mask[..., None]

        for i in range(self.num_layers):
            tokens = TransformerBlock(self.token_dim, dropout=self.dropout,
                                      name=f"layer{i}")(
                tokens, pad_mask, train=train)

        denom = jnp.maximum(jnp.sum(pad_mask, axis=-1, keepdims=True), 1.0)
        pooled = jnp.sum(tokens * pad_mask[..., None], axis=1) / denom
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return TorchLinear(1, name="cox_head")(pooled).squeeze(-1)
