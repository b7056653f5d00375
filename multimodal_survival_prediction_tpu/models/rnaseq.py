"""RNA-seq-only Cox MLP (reference train_rnaseq_only.py:126-151).

MLP 5005 -> 1024 -> 512 -> 256 -> 1; each hidden layer is
Linear + BatchNorm1d + ReLU + Dropout(0.3); output is a single log-hazard.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import MLPBlock, TorchLinear


class RNASeqSurvivalModel(nn.Module):
    hidden_dims: Sequence[int] = (1024, 512, 256)
    dropout: float = 0.3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, rnaseq, *, train: bool = False):
        x = rnaseq
        for i, h in enumerate(self.hidden_dims):
            x = MLPBlock(
                h, dropout=self.dropout, train=train, dtype=self.dtype,
                name=f"block{i}",
            )(x)
        log_hazard = TorchLinear(1, dtype=self.dtype, name="head")(x)
        return log_hazard.squeeze(-1)  # (B,)
