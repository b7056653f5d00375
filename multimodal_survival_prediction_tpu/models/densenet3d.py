"""DenseNet121 with 3D convolutions — the CT encoder.

Faithful re-implementation of the architecture MONAI's
``DenseNet121(spatial_dims=3, in_channels=1, out_channels=128,
pretrained=False)`` provides (used at reference final_multimodal.py:66-71,
simple_fusion.py:182-187, partial_modality_training.py:171-176):

  conv0 7^3/s2 (64ch, no bias) -> BN -> ReLU -> maxpool 3^3/s2
  dense blocks (6, 12, 24, 16), growth 32, bottleneck 4*growth 1x1x1
  transitions: BN -> ReLU -> 1x1x1 conv (channels/2) -> avgpool 2^3/s2
  final BN -> ReLU -> global avg pool -> Linear(1024 -> out_features)

Init matches MONAI: kaiming-normal conv weights, BN gamma=1/beta=0, head
Linear bias=0 (weight keeps torch Linear default).

TPU-native choices: channels-last (B,D,H,W,C) so XLA lowers the 3D convs to
MXU-tiled convolutions; compute dtype configurable (bfloat16 for throughput,
float32 accumulation via preferred_element_type inside XLA conv).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.fused_dense import bn_relu_conv1x1_reference, fused_bn_relu_conv1x1
from .layers import BatchNorm, torch_uniform_init


def kaiming_normal_init(key, shape, dtype=jnp.float32):
    """Torch kaiming_normal_ (fan_in, relu gain) over flax conv kernel layout
    (spatial..., in_ch, out_ch)."""
    fan_in = int(np.prod(shape[:-1]))
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel,) * 3,
            strides=(self.stride,) * 3,
            padding=[(pad, pad)] * 3,
            use_bias=False,
            kernel_init=kaiming_normal_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class _BNVars(nn.Module):
    """Declares flax ``nn.BatchNorm``'s exact variables (names, shapes,
    float32 dtypes, init values — flax/linen/normalization.py) WITHOUT
    computing anything: the fused Pallas path (ops/fused_dense.py) reads
    them directly. Variable paths and RNG derivation are identical to the
    unfused modules', so checkpoints and seeds are interchangeable."""

    features: int

    @nn.compact
    def __call__(self):
        c = self.features
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), [c])
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), [c])
        scale = self.param("scale", nn.initializers.ones, [c], jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, [c], jnp.float32)
        return scale, bias, ra_mean, ra_var


class _Norm1Vars(nn.Module):
    """Path twin of ``BatchNorm`` (which nests nn.BatchNorm as "bn")."""

    features: int

    @nn.compact
    def __call__(self):
        return _BNVars(self.features, name="bn")()


class _ConvKernelVars(nn.Module):
    """Path twin of a bias-free 1x1x1 ``nn.Conv``'s kernel param."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", kaiming_normal_init,
            (1, 1, 1, self.in_features, self.features), jnp.float32)


class _Conv1Vars(nn.Module):
    """Path twin of ``_Conv`` (which nests nn.Conv as "conv")."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _ConvKernelVars(self.features, self.in_features,
                               name="conv")()


def _fused_stage(mod, x, *, norm_name, conv_name, out_features, dtype):
    """Shared fused BN->ReLU->1x1-conv stage (DenseLayer stage 1 AND
    Transition — a transition IS the same shape over the full-width trunk).
    One home for the BN semantics that must stay in sync with
    models/layers.BatchNorm: momentum 0.9 running-average update, biased
    variance, eps 1e-5, and the flax init branch (init traces the plain-XLA
    oracle, never Pallas, and skips the running-stats update).

    ``mod`` is the calling module (inside its compact frame, so the
    variable twins bind as its children under the standard names)."""
    c = x.shape[-1]
    scale, bias, ra_mean, ra_var = _Norm1Vars(c, name=norm_name)()
    kernel = _Conv1Vars(out_features, c, name=conv_name)()
    cdt = dtype or jnp.result_type(x, kernel)
    x2 = x.reshape(-1, c).astype(cdt)
    w2 = kernel.reshape(c, out_features).astype(cdt)
    if mod.is_initializing():
        out2, _, _ = bn_relu_conv1x1_reference(x2, scale, bias, w2)
    else:
        out2, mean, var = fused_bn_relu_conv1x1(x2, scale, bias, w2)
        # flax running-average update (momentum 0.9, biased variance)
        ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
        ra_var.value = 0.9 * ra_var.value + 0.1 * var
    return out2.reshape(x.shape[:-1] + (out_features,))


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    dropout: float
    train: bool
    dtype: jnp.dtype | None = None
    # concat=False returns only the growth channels (the shared-trunk 'dus'
    # path below owns the trunk buffer and writes them in place); the param
    # tree is IDENTICAL either way, so checkpoints are interchangeable.
    concat: bool = True
    # Fuse norm1->relu->conv1 into the two-pass Pallas op (train mode only;
    # ops/fused_dense.py — round-4 HBM lever). The variable tree is bit-
    # identical to the standard path, so checkpoints/seeds interchange.
    fused_bn1: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused_bn1 and self.train:
            y = self._fused_stage1(x)
        else:
            y = BatchNorm(use_running_average=not self.train,
                          dtype=self.dtype, name="norm1")(x)
            y = nn.relu(y)
            y = _Conv(self.bn_size * self.growth_rate, 1, dtype=self.dtype,
                      name="conv1")(y)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="norm2")(y)
        y = nn.relu(y)
        y = _Conv(self.growth_rate, 3, dtype=self.dtype, name="conv2")(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not self.train)(y)
        if not self.concat:
            return y
        return jnp.concatenate([x, y], axis=-1)

    def _fused_stage1(self, x):
        """norm1 -> relu -> conv1 via ops.fused_dense (two HBM passes over
        the trunk, custom VJP). Train-mode only; the caller guarantees it.
        Semantics live in the shared ``_fused_stage`` helper."""
        return _fused_stage(
            self, x, norm_name="norm1", conv_name="conv1",
            out_features=self.bn_size * self.growth_rate, dtype=self.dtype)


class Transition(nn.Module):
    out_channels: int
    train: bool
    dtype: jnp.dtype | None = None
    # Same fused Pallas stage as DenseLayer.fused_bn1 — a transition IS a
    # BN->ReLU->1x1-conv over the full-width trunk (the avg-pool stays XLA).
    fused_bn1: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused_bn1 and self.train:
            x = _fused_stage(self, x, norm_name="norm", conv_name="conv",
                             out_features=self.out_channels,
                             dtype=self.dtype)
        else:
            x = BatchNorm(use_running_average=not self.train,
                          dtype=self.dtype, name="norm")(x)
            x = nn.relu(x)
            x = _Conv(self.out_channels, 1, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))


class DenseNet121_3D(nn.Module):
    """Input (B, D, H, W, 1) -> features (B, out_features)."""

    out_features: int = 128
    init_features: int = 64
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    bn_size: int = 4
    dropout: float = 0.0
    remat: bool = False  # rematerialize dense layers: trade FLOPs for HBM
    dtype: jnp.dtype | None = None
    # Concat-trunk strategy (round-4 HBM lever, docs/PERF.md):
    #   'concat' — jnp.concatenate per layer (the reference/MONAI/torch
    #     pattern). XLA materializes width-specialized trunk copies: the
    #     bs=128 HLO shows each layer's 32 growth channels dynamic-update-
    #     sliced into up to THREE separate trunk buffers plus
    #     AllocateBuffer+copy chains — ~34% of the step's modeled HBM bytes.
    #   'dus' — ONE preallocated full-width trunk per block; each layer
    #     reads a static channel-prefix slice and writes its growth channels
    #     with lax.dynamic_update_slice_in_dim at a static offset. Version
    #     chains are linear (each trunk version has a single consumer), so
    #     XLA can update in place instead of copying per consumer width.
    # Math is identical (each conv/BN reads exactly the values the concat
    # version would hand it); the param tree is identical, so checkpoints
    # are interchangeable across modes (tests/test_models.py pins both).
    trunk: str = "concat"
    # Fuse dense layers' norm1->relu->conv1 AND transitions' norm->relu->conv
    # into the two-pass Pallas op (ops/fused_dense.py; train mode only,
    # single-shard only — see its docstring). True = fuse everywhere; an int
    # = fuse only stages whose trunk has <= that many rows (B*D*H*W) — the
    # round-4 microbench (benchmarks/probe_fused_dense.py) measured the hand
    # kernel FASTER than XLA's schedule at <=32768 rows but slower at
    # block0's 262144 (docs/PERF.md). Opt-in perf experiment, measured via
    # benchmarks/probe_batch_scaling.py --fused-bn1[-rows N]; variable tree
    # identical either way, checkpoints interchangeable.
    fused_bn1: bool | int = False

    def _fuse_rows(self, rows: int) -> bool:
        if isinstance(self.fused_bn1, bool):
            return self.fused_bn1
        return rows <= int(self.fused_bn1)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # Each spatial dim is halved by conv0, the pool, and every transition
        # (2 + len(blocks) - 1 halvings). Dims that bottom out at zero produce
        # silent NaNs (empty mean); fail loudly instead — exactly like
        # torch/MONAI would crash on the same undersized input.
        min_dim = 2 ** (2 + len(self.block_config) - 1)
        if any(s < min_dim for s in x.shape[1:4]):
            raise ValueError(
                f"DenseNet121_3D needs spatial dims >= {min_dim}, got "
                f"{x.shape[1:4]} (use backbone='simple_cnn' for tiny inputs)")
        x = _Conv(self.init_features, 7, stride=2, dtype=self.dtype,
                  name="conv0")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding=[(1, 1)] * 3)

        # jax.checkpoint over each dense layer: activations of the concat
        # trunk dominate memory at large batch; remat re-computes them in the
        # backward pass so batch (and thus MXU utilization) can scale.
        layer_cls = (nn.remat(DenseLayer, static_argnums=())
                     if self.remat else DenseLayer)
        channels = self.init_features
        for bi, num_layers in enumerate(self.block_config):
            fuse = self._fuse_rows(int(np.prod(x.shape[:-1])))
            if self.trunk == "dus":
                total = channels + num_layers * self.growth_rate
                # one full-width trunk per block; the initial pad is the only
                # whole-trunk write (per block, not per layer)
                trunk = jnp.pad(
                    x, [(0, 0)] * 4 + [(0, total - x.shape[-1])])
                off = channels
                for li in range(num_layers):
                    xin = jax.lax.slice_in_dim(trunk, 0, off, axis=4)
                    y = layer_cls(
                        self.growth_rate, self.bn_size, self.dropout, train,
                        dtype=self.dtype, concat=False,
                        fused_bn1=fuse,
                        name=f"block{bi}_layer{li}",
                    )(xin)
                    trunk = jax.lax.dynamic_update_slice_in_dim(
                        trunk, y.astype(trunk.dtype), off, axis=4)
                    off += self.growth_rate
                x = trunk
            else:
                for li in range(num_layers):
                    x = layer_cls(
                        self.growth_rate, self.bn_size, self.dropout, train,
                        dtype=self.dtype, fused_bn1=fuse,
                        name=f"block{bi}_layer{li}",
                    )(x)
            channels += num_layers * self.growth_rate
            if bi != len(self.block_config) - 1:
                channels //= 2
                x = Transition(channels, train, dtype=self.dtype,
                               fused_bn1=fuse,
                               name=f"transition{bi}")(x)

        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="norm5")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # AdaptiveAvgPool3d(1) + flatten
        x = nn.Dense(
            self.out_features,
            kernel_init=torch_uniform_init(channels),
            bias_init=nn.initializers.zeros,  # MONAI zeroes the head bias
            dtype=self.dtype,
            name="head",
        )(x)
        return x
