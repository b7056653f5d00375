"""Fused train-mode BatchNorm -> ReLU -> 1x1x1 conv (Pallas TPU kernels).

This is the DenseNet dense-layer *stage 1* — ``norm1 -> relu -> conv1`` in
MONAI's ``_DenseLayer`` (the flagship CT encoder, reference
partial_modality_training.py:171-176) — fused into two HBM passes over the
concat trunk with a custom VJP.

Why (docs/PERF.md round-4 HBM audit): at bs=128 the unfused stage lowers to
a moments pass, a normalize/ReLU fusion, and a conv fusion — the trunk is
read ~3x per layer and the normalized copy is materialized in HBM. Here:

  forward   pass 1  ``_moments``     read x once, per-channel sum/sum-sq
            pass 2  ``_apply``       read x once, normalize+ReLU in VMEM,
                                     matmul the 1x1x1 conv on the MXU,
                                     write only the (N, 128) output
  backward  pass 1  ``_bwd_reduce``  read x,g once; recompute the normalized
                                     activations tile-by-tile in VMEM;
                                     accumulate dW, dgamma, dbeta
            pass 2  ``_bwd_dx``      read x,g once; train-mode BN backward
                                     dx = r*gamma*(dz - mean(dz) - xhat*mean(dz*xhat))

The normalized trunk is never materialized in HBM, in either direction.

Semantics match ``flax.linen.BatchNorm(momentum=0.9, epsilon=1e-5,
use_fast_variance=True, force_float32_reductions=True)`` in train mode
followed by ``nn.relu`` and a bias-free 1x1x1 ``nn.Conv``: statistics and
normalization in float32 (fast variance, negatives clipped to zero), the
normalized result cast to the compute dtype before the MXU matmul, float32
accumulation. ``bn_relu_conv1x1_reference`` below is the plain-XLA oracle
the tests pin the kernels against.

Constraints (documented, enforced by the opt-in call sites):
  * train-mode batch statistics only — eval uses running averages and stays
    on the standard XLA path (models/densenet3d.py falls back);
  * single-shard arrays — a Pallas custom call does not auto-partition
    under a mesh; the fused path is a single-chip trainer experiment
    (``DenseNet121_3D(fused_bn1=True)`` /
    ``benchmarks/probe_batch_scaling.py --fused-bn1``), default OFF;
  * the batch-stat outputs (mean, var) feed flax running-average updates
    only and are treated as non-differentiable (their cotangents are
    ignored) — exactly flax's semantics, where running stats never carry
    gradients.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= cap (grid tiles must cover N
    exactly; N here is batch x pooled-spatial, a power-of-two times the
    batch in practice). Warns when no divisor comes close to the cap —
    an unlucky (odd/prime) row count degenerates to a rows-per-step grid
    that is correct but pathologically slow; call sites should pad N to a
    friendly multiple instead of eating that silently."""
    for t in range(min(n, cap), 0, -1):
        if n % t == 0:
            if t * 8 <= min(n, cap):
                warnings.warn(
                    f"fused_dense._pick_tile: N={n} has no divisor near the "
                    f"cap {cap}; using tile={t} ({n // t} grid steps) — "
                    "pathologically small tiles; pad the row count to a "
                    "power-of-two multiple for the fused path",
                    stacklevel=3)
            return t
    return 1


# ---------------------------------------------------------------- forward


def _moments_kernel(x_ref, sum_ref, sq_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    xf = x_ref[:].astype(jnp.float32)
    sum_ref[:] += jnp.sum(xf, axis=0, keepdims=True)
    sq_ref[:] += jnp.sum(xf * xf, axis=0, keepdims=True)


def _moments(x2d):
    n, c = x2d.shape
    tile = _pick_tile(n, 1024)
    return pl.pallas_call(
        _moments_kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * n * c,
            bytes_accessed=n * c * x2d.dtype.itemsize + 8 * c,
            transcendentals=0),
        interpret=_interpret(),
    )(x2d)


def _apply_kernel(x_ref, mul_ref, add_ref, w_ref, o_ref):
    a = jnp.maximum(
        x_ref[:].astype(jnp.float32) * mul_ref[:] + add_ref[:], 0.0)
    o_ref[:] = jnp.dot(a.astype(w_ref.dtype), w_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _apply(x2d, mul2, add2, w2d):
    n, c = x2d.shape
    f = w2d.shape[1]
    tile = _pick_tile(n, 512)
    return pl.pallas_call(
        _apply_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * f + 3 * n * c,
            bytes_accessed=(n * c * x2d.dtype.itemsize
                            + c * f * w2d.dtype.itemsize
                            + n * f * x2d.dtype.itemsize + 8 * c),
            transcendentals=0),
        interpret=_interpret(),
    )(x2d, mul2, add2, w2d)


# ---------------------------------------------------------------- backward


def _bwd_reduce_kernel(x_ref, g_ref, w_ref, mul_ref, add_ref,
                       mean_ref, rstd_ref, dw_ref, dg_ref, db_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    xf = x_ref[:].astype(jnp.float32)
    z = xf * mul_ref[:] + add_ref[:]
    a = jnp.maximum(z, 0.0)
    # dW += a^T @ g  (conv-kernel grad; contraction over the row tile)
    dw_ref[:] += jax.lax.dot_general(
        a.astype(w_ref.dtype), g_ref[:],
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # da = g @ W^T;  dz = relu'(z) * da
    da = jax.lax.dot_general(
        g_ref[:], w_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dz = jnp.where(z > 0, da, 0.0)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    xhat = (xf - mean_ref[:]) * rstd_ref[:]
    dg_ref[:] += jnp.sum(dz * xhat, axis=0, keepdims=True)


def _bwd_reduce(x2d, g, w2d, mul2, add2, mean2, rstd2):
    n, c = x2d.shape
    f = w2d.shape[1]
    tile = _pick_tile(n, 256)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec, vec, vec, vec,
        ],
        out_specs=[
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec, vec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, f), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c * f + 8 * n * c,
            bytes_accessed=(n * c * x2d.dtype.itemsize
                            + n * f * g.dtype.itemsize
                            + 5 * c * f * 4 + 24 * c),
            transcendentals=0),
        interpret=_interpret(),
    )(x2d, g, w2d, mul2, add2, mean2, rstd2)


def _bwd_dx_kernel(x_ref, g_ref, w_ref, mul_ref, add_ref,
                   mean_ref, rstd_ref, c1_ref, c2_ref, dx_ref):
    xf = x_ref[:].astype(jnp.float32)
    z = xf * mul_ref[:] + add_ref[:]
    da = jax.lax.dot_general(
        g_ref[:], w_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dz = jnp.where(z > 0, da, 0.0)
    xhat = (xf - mean_ref[:]) * rstd_ref[:]
    dx_ref[:] = (mul_ref[:] * (dz - c1_ref[:] - xhat * c2_ref[:])
                 ).astype(dx_ref.dtype)


def _bwd_dx(x2d, g, w2d, mul2, add2, mean2, rstd2, c1, c2):
    n, c = x2d.shape
    f = w2d.shape[1]
    tile = _pick_tile(n, 256)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_dx_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * f + 10 * n * c,
            bytes_accessed=(2 * n * c * x2d.dtype.itemsize
                            + n * f * g.dtype.itemsize
                            + c * f * w2d.dtype.itemsize + 24 * c),
            transcendentals=0),
        interpret=_interpret(),
    )(x2d, g, w2d, mul2, add2, mean2, rstd2, c1, c2)


# ------------------------------------------------------------ the fused op


def _check_dtypes(x2d, w2d):
    # The kernels cast the normalized activations to w2d.dtype before the
    # MXU matmul while the reference oracle casts to x2d.dtype — keep the
    # two paths equivalent by requiring one compute dtype (ADVICE r4).
    if x2d.dtype != w2d.dtype:
        raise TypeError(
            f"fused_bn_relu_conv1x1 requires x and W in the same compute "
            f"dtype, got x={x2d.dtype} W={w2d.dtype}; cast both at the "
            "call site (models/densenet3d.py does)")


def _stats(x2d, scale, bias, eps):
    n = x2d.shape[0]
    s, sq = _moments(x2d)
    mean2 = s / n
    # flax fast variance, negatives clipped to zero (normalization.py)
    var2 = jnp.maximum(sq / n - mean2 * mean2, 0.0)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    mul2 = rstd2 * scale.astype(jnp.float32)[None, :]
    add2 = bias.astype(jnp.float32)[None, :] - mean2 * mul2
    return mean2, var2, rstd2, mul2, add2


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_bn_relu_conv1x1(x2d, scale, bias, w2d, eps=1e-5):
    """Train-mode ``relu(batch_norm(x)) @ W`` in two HBM passes over ``x``.

    Args:
      x2d: (N, C) activations — the trunk reshaped to 2D (a free collapse
        of the leading batch/spatial dims under channels-last layout).
      scale, gamma / bias, beta: (C,) float32 BN affine params.
      w2d: (C, F) conv kernel, already cast to the compute dtype.
      eps: BN epsilon (static).

    Returns:
      (out2d, mean, var): the (N, F) stage output in ``x2d.dtype``, and the
      float32 (C,) batch statistics for the flax running-average update.
      ``mean``/``var`` are NON-differentiable outputs (see module docstring).
    """
    _check_dtypes(x2d, w2d)
    mean2, var2, _, mul2, add2 = _stats(x2d, scale, bias, eps)
    out = _apply(x2d, mul2, add2, w2d)
    return out, mean2[0], var2[0]


def _fused_fwd(x2d, scale, bias, w2d, eps):
    _check_dtypes(x2d, w2d)
    mean2, var2, rstd2, mul2, add2 = _stats(x2d, scale, bias, eps)
    out = _apply(x2d, mul2, add2, w2d)
    res = (x2d, w2d, mul2, add2, mean2, rstd2)
    return (out, mean2[0], var2[0]), res


def _fused_bwd(eps, res, ct):
    g_out, _g_mean, _g_var = ct  # stats feed stop-grad running updates only
    x2d, w2d, mul2, add2, mean2, rstd2 = res
    n = x2d.shape[0]
    g = g_out.astype(x2d.dtype)
    dw, dg, db = _bwd_reduce(x2d, g, w2d, mul2, add2, mean2, rstd2)
    # train-mode BN backward needs the completed reductions first:
    # dx = r*gamma * (dz - sum(dz)/N - xhat * sum(dz*xhat)/N)
    c1 = db / n
    c2 = dg / n
    dx = _bwd_dx(x2d, g, w2d, mul2, add2, mean2, rstd2, c1, c2)
    return dx, dg[0], db[0], dw.astype(w2d.dtype)


fused_bn_relu_conv1x1.defvjp(_fused_fwd, _fused_bwd)


def bn_relu_conv1x1_reference(x2d, scale, bias, w2d, eps=1e-5):
    """Plain-XLA oracle with the exact same semantics (flax train-mode BN in
    float32 -> cast -> matmul). Used by tests to pin the kernels, and by the
    model's ``is_initializing`` branch so flax init never runs Pallas."""
    n = x2d.shape[0]
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0)
    var = jnp.maximum(jnp.mean(xf * xf, axis=0) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mul = rstd * scale.astype(jnp.float32)
    a = jnp.maximum(xf * mul[None, :]
                    + (bias.astype(jnp.float32) - mean * mul)[None, :], 0.0)
    out = jnp.dot(a.astype(x2d.dtype), w2d,
                  preferred_element_type=jnp.float32).astype(x2d.dtype)
    return out, mean, var
