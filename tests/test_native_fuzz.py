"""Deterministic fuzz of the C++ NIfTI decoder (csrc/msp_native.cpp).

The training pipeline's failure->missing-modality semantics (SURVEY §5)
require that a corrupt or truncated .nii/.nii.gz NEVER crash the process:
decode must either return a volume or raise, so the ingest layer can clear
the modality mask bit. ADVICE r1 flagged missing vox_offset/dims validation
(fixed in round 2); this fuzz keeps the whole header surface honest —
random byte corruption, truncation, garbage files, and adversarial dim /
vox_offset / datatype values, over both the raw and gzip containers.
"""

import gzip
import struct

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.data.native import (
    native_available,
    read_nifti_fast,
)
from multimodal_survival_prediction_tpu.data.nifti import write_nifti

pytestmark = pytest.mark.skipif(
    not native_available(), reason="C++ native library unavailable")


def _decode_no_crash(path):
    """Decode must return or raise — anything but a crash/hang. When it DOES
    return, the volume must be sane (the assert sits outside the try so a
    bogus-allocation regression actually fails the test)."""
    try:
        vol = read_nifti_fast(path)
    except Exception:
        return
    assert vol.data.size < 10_000_000  # no absurd allocation escaped


@pytest.fixture()
def valid_nii(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.integers(-500, 500, size=(6, 8, 10)).astype(np.int16)
    p = tmp_path / "v.nii"
    write_nifti(p, vol, spacing=(0.7, 0.7, 2.5))
    return p


def test_fuzz_header_byte_corruption(valid_nii, tmp_path, monkeypatch):
    monkeypatch.setenv("MSP_NATIVE_IO", "1")
    raw = valid_nii.read_bytes()
    rng = np.random.default_rng(1)
    p = tmp_path / "fuzz.nii"
    for i in range(150):
        buf = bytearray(raw)
        # corrupt 1-8 random bytes, biased into the 352-byte header
        for _ in range(int(rng.integers(1, 9))):
            off = int(rng.integers(0, min(400, len(buf))))
            buf[off] = int(rng.integers(0, 256))
        p.write_bytes(bytes(buf))
        _decode_no_crash(p)


def test_fuzz_truncation(valid_nii, tmp_path, monkeypatch):
    monkeypatch.setenv("MSP_NATIVE_IO", "1")
    raw = valid_nii.read_bytes()
    rng = np.random.default_rng(2)
    p = tmp_path / "trunc.nii"
    cuts = sorted(set(int(rng.integers(0, len(raw))) for _ in range(40))
                  | {0, 1, 4, 347, 348, 352, 356, len(raw) - 1})
    for cut in cuts:
        p.write_bytes(raw[:cut])
        _decode_no_crash(p)


def test_fuzz_adversarial_header_fields(valid_nii, tmp_path, monkeypatch):
    """Targeted evil values in dim[], datatype, bitpix, vox_offset,
    scl_slope/inter — the fields whose arithmetic can under/overflow."""
    monkeypatch.setenv("MSP_NATIVE_IO", "1")
    raw = bytearray(valid_nii.read_bytes())
    p = tmp_path / "adv.nii"
    evil_i16 = [-1, 0, -32768, 32767, 1, 7]
    evil_f32 = [float("nan"), float("inf"), -float("inf"), -1.0, 0.0,
                1e30, -1e30, 3.5, 352.0, 1e9]
    cases = []
    for v in evil_i16:  # dim[1..3] at offsets 42/44/46; dim[0] at 40
        for off in (40, 42, 44, 46):
            cases.append((off, struct.pack("<h", v)))
    for v in (-1, 0, 2, 4, 8, 16, 64, 256, 512, 1024, 32767):
        cases.append((70, struct.pack("<h", v)))       # datatype
        cases.append((72, struct.pack("<h", v)))       # bitpix
    for v in evil_f32:
        cases.append((108, struct.pack("<f", v)))      # vox_offset
        cases.append((112, struct.pack("<f", v)))      # scl_slope
        cases.append((116, struct.pack("<f", v)))      # scl_inter
    for off, payload in cases:
        buf = bytearray(raw)
        buf[off:off + len(payload)] = payload
        p.write_bytes(bytes(buf))
        _decode_no_crash(p)


@pytest.mark.slow
def test_fuzz_gzip_container(valid_nii, tmp_path, monkeypatch):
    """Corruption UNDER the gzip layer and of the gzip stream itself."""
    monkeypatch.setenv("MSP_NATIVE_IO", "1")
    raw = valid_nii.read_bytes()
    rng = np.random.default_rng(3)
    p = tmp_path / "fuzz.nii.gz"
    for i in range(40):
        buf = bytearray(raw)
        for _ in range(int(rng.integers(1, 6))):
            off = int(rng.integers(0, min(400, len(buf))))
            buf[off] = int(rng.integers(0, 256))
        gz = bytearray(gzip.compress(bytes(buf)))
        if i % 3 == 0 and len(gz) > 20:  # also corrupt the stream itself
            gz[int(rng.integers(10, len(gz)))] = int(rng.integers(0, 256))
        p.write_bytes(bytes(gz))
        _decode_no_crash(p)
    # pure garbage with a gz extension
    for n in (0, 1, 10, 352, 1000):
        p.write_bytes(bytes(rng.integers(0, 256, size=n, dtype=np.uint8)))
        _decode_no_crash(p)
