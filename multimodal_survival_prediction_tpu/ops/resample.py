"""Fused CT preprocessing: min-max normalize + trilinear resample to a fixed
training shape — the reference's host-side hot loop turned into device math.

Reference behavior (reference partial_modality_training.py:94-109,
simple_fusion.py:119-128): per sample, per epoch, on host:
  (x - min) / (max - min + 1e-8)  ->  scipy.ndimage.zoom(vol, out/in, order=1)
scipy's order-1 zoom (grid_mode=False) maps output coordinate o to input
coordinate o * (in-1)/(out-1) (align-corners; verified empirically) — so a
separable trilinear resample is exactly three small dense matmul contractions
with interpolation matrices R_axis (out, in), two nonzeros per row. On TPU
those contractions ride the MXU; normalization is an affine map that commutes
with interpolation (rows of R sum to 1), so it folds into a scale/shift
epilogue.

Two implementations, golden-tested against scipy:
  * ``resample_normalize``: XLA einsum chain (always available, any backend).
  * ``resample_normalize_pallas``: one fused Pallas kernel streaming the
    volume through VMEM slice-by-slice with an on-chip (Do,Ho,Wo) f32
    accumulator — one HBM read of the volume, one write of the output.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def linear_interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix M with M @ x == scipy.ndimage.zoom(x, out/in, order=1)."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    coords = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (coords - lo).astype(np.float32)
    m[np.arange(out_size), lo] = 1.0 - frac
    m[np.arange(out_size), lo + 1] = frac
    return m


@lru_cache(maxsize=64)
def _matrices(in_shape: tuple, out_shape: tuple):
    return tuple(
        jnp.asarray(linear_interp_matrix(i, o))
        for i, o in zip(in_shape, out_shape)
    )


@partial(jax.jit, static_argnames=("out_shape", "hu_window"))
def _resample_normalize_xla(vol, out_shape, hu_window=None):
    rz, ry, rx = _matrices(vol.shape, out_shape)
    v = vol.astype(jnp.float32)
    if hu_window is not None:
        # CT Hounsfield windowing (e.g. soft tissue (-150, 250)) BEFORE the
        # min-max normalize. The reference README claims intensity windowing
        # but its code never does it (SURVEY §2.3 note); here it is a
        # capability, default off for reference parity.
        v = jnp.clip(v, hu_window[0], hu_window[1])
    mn = jnp.min(v)
    mx = jnp.max(v)
    scale = 1.0 / (mx - mn + 1e-8)
    # contract W first (largest shrink comes earliest): (D,H,W)@(W,Wo)
    v = jnp.einsum("zhw,ow->zho", v, rx, precision="highest")
    v = jnp.einsum("zho,ph->zpo", v, ry, precision="highest")
    v = jnp.einsum("zpo,qz->qpo", v, rz, precision="highest")
    return v * scale - mn * scale


def resample_normalize(vol, out_shape=(64, 64, 32), hu_window=None):
    """(D,H,W) array -> (out_shape) float32, (optionally HU-windowed,)
    min-max normalized, then trilinearly resampled (reference order:
    normalize BEFORE zoom — identical result because interpolation weights
    are a partition of unity)."""
    return _resample_normalize_xla(
        jnp.asarray(vol), tuple(out_shape),
        tuple(hu_window) if hu_window is not None else None)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _wpass_kernel(vol_ref, rxt_ref, out_ref, mn_ref, mx_ref, *,
                  hu_window=None):
    """One HBM pass: per (ROWS, W) tile of the (D*H, W)-reshaped volume,
      * fold the tile's min/max into SMEM accumulators (fused with the read
        — XLA needs a separate reduction pass for this),
      * contract the W axis on the MXU: tile @ rx^T -> (ROWS, Wo).
    Rows past D*H are grid padding; they can't corrupt min/max because the
    caller pads the reshaped array with edge values, and their matmul output
    rows are sliced away afterwards."""
    i = pl.program_id(0)

    # native-dtype tile (int16 CTs) converted in-register: the volume
    # crosses HBM once in its on-disk width instead of via a separate
    # full-size float32 materialization pass (2x traffic on int16)
    tile = vol_ref[...].astype(jnp.float32)
    if hu_window is not None:
        # CT Hounsfield windowing, fused into the same single HBM read
        tile = jnp.clip(tile, hu_window[0], hu_window[1])
    tmin = jnp.min(tile)
    tmax = jnp.max(tile)

    @pl.when(i == 0)
    def _init():
        mn_ref[0] = tmin
        mx_ref[0] = tmax

    @pl.when(i != 0)
    def _fold():
        mn_ref[0] = jnp.minimum(mn_ref[0], tmin)
        mx_ref[0] = jnp.maximum(mx_ref[0], tmax)

    out_ref[...] = jnp.dot(tile, rxt_ref[...],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("out_shape", "rows", "hu_window"))
def _resample_normalize_pallas(vol, out_shape, rows, hu_window=None):
    from jax.experimental.pallas import tpu as pltpu

    # float64 (rare) isn't a TPU VMEM dtype; every other supported input
    # (u)int8/16/32, float32 streams through the kernel in its native width
    # and converts in-register (see _wpass_kernel)
    if vol.dtype == jnp.float64:
        vol = vol.astype(jnp.float32)
    d, h, w = vol.shape
    do, ho, wo = out_shape
    rzn, ryn, rxn = (linear_interp_matrix(i, o)
                     for i, o in zip(vol.shape, out_shape))

    n_rows = d * h
    rows = min(rows, n_rows)
    n_tiles = -(-n_rows // rows)
    padded = n_tiles * rows
    flat = vol.reshape(n_rows, w)
    if padded != n_rows:
        # pad with edge rows: keeps min/max exact, padded outputs discarded
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(flat[-1:], (padded - n_rows, w))], axis=0)

    tmp, mn, mx = pl.pallas_call(
        partial(_wpass_kernel, hu_window=hu_window),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wo), lambda i: (0, 0),
                          memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, wo), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded, wo), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(flat, jnp.asarray(rxn.T))

    v = tmp[:n_rows].reshape(d, h, wo)
    v = jnp.einsum("zho,ph->zpo", v, jnp.asarray(ryn), precision="highest")
    v = jnp.einsum("zpo,qz->qpo", v, jnp.asarray(rzn), precision="highest")
    scale = 1.0 / (mx[0] - mn[0] + 1e-8)
    return v * scale - mn[0] * scale


def resample_normalize_pallas(vol, out_shape=(64, 64, 32), rows: int = 1024,
                              hu_window=None):
    """Fused Pallas version of :func:`resample_normalize` (TPU hot path).

    The volume is HBM-bandwidth bound; everything downstream of the first
    contraction is ~W/Wo smaller. So the Pallas kernel covers exactly the
    expensive pass — streaming (ROWS, W) tiles through VMEM once, computing
    min/max AND the W-axis contraction in the same read — and the remaining
    tiny contractions + the normalize epilogue stay in XLA where they fuse to
    noise. The host array is shipped in its NATIVE dtype (CTs are int16 — half
    the host->HBM bytes) and converted on device.
    """
    return _resample_normalize_pallas(
        jnp.asarray(vol), tuple(out_shape), int(rows),
        tuple(hu_window) if hu_window is not None else None)


def preprocess_volume(vol, out_shape=(64, 64, 32), use_pallas: bool = False):
    """Public entry: one CT volume -> normalized fixed-shape training tensor."""
    fn = resample_normalize_pallas if use_pallas else resample_normalize
    return fn(vol, out_shape)


# ---------------------------------------------------------------------------
# Shape-bucketed resample: one compiled program per bucket, not per CT shape
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("out_shape", "hu_window"))
def _resample_normalize_bucketed(vol_padded, rz, ry, rx, valid_dhw, out_shape,
                                 hu_window=None):
    """Like _resample_normalize_xla but for a volume embedded in a padded
    buffer. The interpolation matrices are RUNTIME inputs whose columns only
    touch the valid region, so the contraction ignores padding exactly; the
    min/max for normalization are masked to the valid region (clipping the
    padding for hu_window is harmless for the same reason)."""
    v = vol_padded.astype(jnp.float32)
    if hu_window is not None:
        v = jnp.clip(v, hu_window[0], hu_window[1])
    d, h, w = v.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) < valid_dhw[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) < valid_dhw[1]
    kk = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2) < valid_dhw[2]
    valid = ii & jj & kk
    mn = jnp.min(jnp.where(valid, v, jnp.inf))
    mx = jnp.max(jnp.where(valid, v, -jnp.inf))
    scale = 1.0 / (mx - mn + 1e-8)
    v = jnp.einsum("zhw,ow->zho", v, rx, precision="highest")
    v = jnp.einsum("zho,ph->zpo", v, ry, precision="highest")
    v = jnp.einsum("zpo,qz->qpo", v, rz, precision="highest")
    return v * scale - mn * scale


def bucket_shape(shape, granularity=(32, 64, 64)):
    """Round each dim up to its granularity multiple."""
    return tuple(-(-s // g) * g for s, g in zip(shape, granularity))


def resample_normalize_bucketed(vol, out_shape=(64, 64, 32),
                                granularity=(32, 64, 64), hu_window=None):
    """Shape-bucketed resample+normalize.

    A real cohort has ~one distinct CT shape per patient (SURVEY: 142 imaging
    patients); jitting per exact shape would mean ~142 TPU compiles. Instead
    the volume is zero-padded into a coarse shape bucket and the (tiny,
    host-built) interpolation matrices — zero beyond the true extent — are
    passed as runtime arguments, so ONE compiled program serves every shape
    in the bucket with bit-identical output to the exact-shape path."""
    vol = np.asarray(vol)
    d, h, w = vol.shape
    pd_, ph, pw = bucket_shape(vol.shape, granularity)
    rz = np.zeros((out_shape[0], pd_), np.float32)
    ry = np.zeros((out_shape[1], ph), np.float32)
    rx = np.zeros((out_shape[2], pw), np.float32)
    rz[:, :d] = linear_interp_matrix(d, out_shape[0])
    ry[:, :h] = linear_interp_matrix(h, out_shape[1])
    rx[:, :w] = linear_interp_matrix(w, out_shape[2])
    padded = np.zeros((pd_, ph, pw), vol.dtype)
    padded[:d, :h, :w] = vol
    return _resample_normalize_bucketed(
        jnp.asarray(padded), jnp.asarray(rz), jnp.asarray(ry),
        jnp.asarray(rx), jnp.asarray([d, h, w], jnp.int32),
        tuple(out_shape),
        tuple(hu_window) if hu_window is not None else None)
