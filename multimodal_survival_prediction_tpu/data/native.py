"""ctypes bindings for the C++ native I/O library (csrc/libmsp_native.so).

The native reader releases the GIL for the whole gzip-decode + transpose, so
VolumePrefetcher's thread pool actually parallelizes across cores — the
pure-Python fallback (data.nifti) serializes on the interpreter lock.

Build with `make -C csrc` (auto-attempted once on first use). Every entry
point falls back to the pure-Python implementation when the library is
unavailable, so nothing hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "libmsp_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    for attempt in ("load", "rebuild"):
        if attempt == "rebuild" or not _SO.exists():
            # -B on the retry: the .so exists but predates a symbol this
            # build binds (stale checkout) — make alone would consider it
            # up to date only if sources were untouched, so force it.
            cmd = ["make", "-C", str(_CSRC)]
            if attempt == "rebuild":
                cmd.append("-B")
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except Exception as e:
                log.info("native build unavailable (%s); using pure-Python "
                         "I/O", e)
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            _bind(lib)
        except OSError as e:
            log.info("native load failed (%s); using pure-Python I/O", e)
            return None
        except AttributeError as e:
            # Stale libmsp_native.so from an older checkout: a symbol this
            # version binds is missing. Rebuild once, then degrade to the
            # pure-Python path (the module contract) instead of raising.
            if attempt == "rebuild":
                log.info("native library stale after rebuild (%s); using "
                         "pure-Python I/O", e)
                return None
            log.info("native library stale (%s); rebuilding", e)
            continue
        _lib = lib
        return _lib
    return None


def _bind(lib):
    """Declare ctypes signatures; raises AttributeError on a stale .so."""
    lib.msp_nifti_open.restype = ctypes.c_void_p
    lib.msp_nifti_open.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.msp_nifti_copy.restype = ctypes.c_int
    lib.msp_nifti_copy.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.msp_nifti_open_any.restype = ctypes.c_void_p
    lib.msp_nifti_open_any.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32)]
    lib.msp_nifti_copy_raw.restype = ctypes.c_int
    lib.msp_nifti_copy_raw.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.msp_nifti_close.argtypes = [ctypes.c_void_p]
    lib.msp_resample_normalize.restype = ctypes.c_int
    lib.msp_resample_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.msp_resample_normalize_any.restype = ctypes.c_int
    lib.msp_resample_normalize_any.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_float, ctypes.c_float]


def native_available() -> bool:
    return _load() is not None


# NIfTI datatype code -> numpy dtype (raw/native-dtype path)
_NIFTI_DTYPES = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
                 64: np.float64, 256: np.int8, 512: np.uint16}


def read_nifti_fast(path):
    """NIfTI -> NiftiImage, fastest available path.

    The C++ reader (set MSP_NATIVE_IO=1) decodes gzip + copies the payload
    with the GIL released so VolumePrefetcher threads scale across cores; it
    keeps the on-disk dtype (int16 CTs — zero conversion work, NIfTI's
    x-fastest layout is byte-identical to C-order (D,H,W)) when scl
    slope/inter are trivial, exactly like the pure-Python reader. Volumes
    needing scaling fall back to the converting float32 path. Both are
    exact; the pure-Python reader remains the default (its heavy ops
    already run in C and it wins single-threaded)."""
    import os

    from .nifti import NiftiImage, read_nifti

    lib = _load() if os.environ.get("MSP_NATIVE_IO") == "1" else None
    if lib is None:
        return read_nifti(path)
    dims = (ctypes.c_int64 * 3)()
    spacing = (ctypes.c_float * 3)()
    origin = (ctypes.c_float * 3)()
    dtype_code = ctypes.c_int32(0)
    handle = lib.msp_nifti_open_any(str(path).encode(), dims, spacing,
                                    origin, ctypes.byref(dtype_code))
    if not handle:
        return read_nifti(path)  # e.g. big-endian files
    try:
        if dtype_code.value:
            dt = np.dtype(_NIFTI_DTYPES[dtype_code.value])
            out = np.empty((dims[0], dims[1], dims[2]), dt)
            rc = lib.msp_nifti_copy_raw(
                ctypes.c_void_p(handle),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.nbytes)
        else:
            out = np.empty((dims[0], dims[1], dims[2]), np.float32)
            rc = lib.msp_nifti_copy(
                ctypes.c_void_p(handle),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            return read_nifti(path)
    finally:
        lib.msp_nifti_close(ctypes.c_void_p(handle))
    affine = np.eye(4)
    affine[0, 0], affine[1, 1], affine[2, 2] = spacing[:]
    affine[:3, 3] = origin[:]
    return NiftiImage(data=out, spacing=tuple(spacing[:]),
                      origin=tuple(origin[:]), affine=affine)


# numpy dtype -> NIfTI datatype code (inverse of _NIFTI_DTYPES, for the
# native-dtype resample entry point)
_DTYPE_CODES = {np.dtype(v): k for k, v in _NIFTI_DTYPES.items()}


def resample_normalize_host(vol: np.ndarray, out_shape,
                            hu_window=None) -> np.ndarray:
    """C++ fused minmax+trilinear resample (host), GIL-free.

    Reads the volume in its NATIVE dtype (int16 CTs resample without ever
    materializing a float32 copy of the 80 MB volume) and supports the same
    optional CT Hounsfield window as the device path (ops/resample.py) —
    equality within float tolerance (atol=2e-5) is pinned in
    tests/test_native_pipeline.py. This is
    the transfer-aware ingest path: on a slow host->device link, resampling
    here and shipping the ~512 KB result beats shipping the full volume
    (data/pipeline.py chooses by measured link bandwidth). Falls back to the
    XLA op if the library is unavailable."""
    lib = _load()
    vol = np.ascontiguousarray(vol)
    if vol.dtype not in _DTYPE_CODES:
        vol = vol.astype(np.float32)
    if lib is None:
        from ..ops.resample import resample_normalize

        return np.asarray(resample_normalize(
            vol, tuple(out_shape), hu_window=hu_window))
    out = np.empty(tuple(out_shape), np.float32)
    lo, hi = (float(hu_window[0]), float(hu_window[1])) if hu_window else (
        0.0, 0.0)
    rc = lib.msp_resample_normalize_any(
        vol.ctypes.data_as(ctypes.c_void_p),
        _DTYPE_CODES[vol.dtype],
        *vol.shape,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *out.shape,
        1 if hu_window else 0, lo, hi)
    if rc != 0:
        raise ValueError(f"resample failed for shape {vol.shape} "
                         f"dtype {vol.dtype}")
    return out
