"""Image-only small 3D CNN (reference generate_km_curves.py:28-54).

Conv3d 1->16->32->64 (all 3^3/s2 + BN + ReLU), global avg pool,
Linear 64->32 + ReLU, risk head 32->1.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoders import SimpleCNN3D
from .layers import TorchLinear


class ImageOnlyModel(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image, *, train: bool = False):
        x = SimpleCNN3D(out_features=64, widths=(16, 32), dtype=self.dtype,
                        name="encoder")(image, train=train)
        x = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc")(x))
        risk = TorchLinear(1, dtype=self.dtype, name="risk_head")(x)
        return risk.squeeze(-1)
