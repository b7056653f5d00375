"""Shared building blocks, torch-parity initialization, TPU-friendly layouts.

Initialization matches PyTorch defaults so parity runs start from the same
weight distribution as the reference (SURVEY §7 "hard parts"):
  * nn.Linear: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    (kaiming_uniform(a=sqrt(5)) collapses to exactly this bound)
  * nn.ConvNd: same with fan_in = in_ch * prod(kernel)
  * nn.BatchNorm: gamma=1, beta=0, running stats (0,1), eps=1e-5,
    torch momentum 0.1 == flax momentum 0.9.

Layouts: volumes are channels-last (B, D, H, W, C) — XLA/TPU's preferred
convolution layout — instead of the reference's NCDHW.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_uniform_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Dense with PyTorch nn.Linear's default init."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_uniform_init(fan_in),
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


class TorchConv(nn.Module):
    """nn.Conv with PyTorch nn.ConvNd's default init (channels-last)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | int = 1
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        import numpy as np

        fan_in = x.shape[-1] * int(np.prod(self.kernel_size))
        return nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=torch_uniform_init(fan_in),
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1, eps 1e-5).

    ``train=True`` uses batch statistics and updates the ``batch_stats``
    collection; ``train=False`` uses running averages — mirroring
    model.train()/model.eval() in the reference training loops
    (reference final_multimodal.py:238, :268).
    """

    use_running_average: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class MLPBlock(nn.Module):
    """Linear -> BatchNorm1d -> ReLU -> Dropout, the reference's repeated cell
    (e.g. reference train_rnaseq_only.py:136-142)."""

    features: int
    dropout: float = 0.3
    use_bn: bool = True
    train: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.features, dtype=self.dtype, name="linear")(x)
        if self.use_bn:
            x = BatchNorm(
                use_running_average=not self.train, dtype=self.dtype, name="norm"
            )(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not self.train)(x)
        return x


def global_avg_pool_3d(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool3d(1) + flatten for (B, D, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2, 3))
