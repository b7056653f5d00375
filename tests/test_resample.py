"""Resample kernels vs scipy.ndimage.zoom order=1 golden (SURVEY §4 item 2)."""

import numpy as np
import pytest
from scipy import ndimage

from multimodal_survival_prediction_tpu.ops.resample import (
    linear_interp_matrix,
    resample_normalize,
    resample_normalize_pallas,
)


def golden(vol, out_shape):
    """Reference semantics: minmax normalize then zoom order=1
    (reference partial_modality_training.py:94-109)."""
    v = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)
    factors = [o / i for i, o in zip(vol.shape, out_shape)]
    return ndimage.zoom(v, factors, order=1)


@pytest.mark.parametrize("in_size,out_size", [(5, 3), (4, 7), (3, 1), (1, 3),
                                              (100, 64), (17, 32)])
def test_interp_matrix_matches_scipy_1d(in_size, out_size, rng):
    x = rng.normal(size=in_size)
    ours = linear_interp_matrix(in_size, out_size) @ x
    sp = ndimage.zoom(x, out_size / in_size, order=1)
    np.testing.assert_allclose(ours, sp, atol=1e-6)


@pytest.mark.parametrize("in_shape", [(48, 96, 96), (40, 64, 64), (9, 11, 13)])
def test_resample_normalize_matches_scipy(in_shape, rng):
    vol = rng.normal(100, 50, size=in_shape).astype(np.float32)
    out = np.asarray(resample_normalize(vol, (64, 64, 32)))
    ref = golden(vol, (64, 64, 32))
    assert out.shape == (64, 64, 32)
    np.testing.assert_allclose(out, ref, atol=2e-5)
    assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5


def test_pallas_matches_xla(rng):
    vol = rng.normal(size=(24, 40, 56)).astype(np.float32)
    a = np.asarray(resample_normalize(vol, (64, 64, 32)))
    b = np.asarray(resample_normalize_pallas(vol, (64, 64, 32)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_identity_resample(rng):
    vol = rng.normal(size=(8, 8, 8)).astype(np.float32)
    out = np.asarray(resample_normalize(vol, (8, 8, 8)))
    ref = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("in_shape", [(48, 96, 96), (33, 70, 100), (9, 11, 13)])
def test_bucketed_matches_exact(in_shape, rng):
    from multimodal_survival_prediction_tpu.ops.resample import (
        resample_normalize_bucketed,
    )

    vol = rng.normal(100, 50, size=in_shape).astype(np.float32)
    exact = np.asarray(resample_normalize(vol, (16, 16, 8)))
    bucketed = np.asarray(resample_normalize_bucketed(vol, (16, 16, 8)))
    np.testing.assert_allclose(bucketed, exact, atol=1e-5)


def test_bucketed_compiles_once_per_bucket(rng):
    from multimodal_survival_prediction_tpu.ops.resample import (
        _resample_normalize_bucketed,
        resample_normalize_bucketed,
    )

    before = _resample_normalize_bucketed._cache_size()
    for shape in [(10, 50, 60), (20, 60, 50), (31, 40, 40)]:  # same bucket
        resample_normalize_bucketed(
            rng.normal(size=shape).astype(np.float32), (8, 8, 8))
    after = _resample_normalize_bucketed._cache_size()
    # <= 1: another test may have already compiled this bucket's program;
    # the point is three distinct shapes add at most ONE compile
    assert after - before <= 1


def test_hu_window(rng):
    vol = rng.normal(0, 500, size=(10, 12, 14)).astype(np.float32)
    clipped = np.clip(vol, -150, 250)
    ref = golden(clipped, (8, 8, 8))
    out = np.asarray(resample_normalize(vol, (8, 8, 8),
                                        hu_window=(-150, 250)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_hu_window_bucketed_and_pallas(rng):
    """HU windowing plumbed through the production ingest paths (bucketed +
    pallas) matches scipy clip->normalize->zoom."""
    from multimodal_survival_prediction_tpu.ops.resample import (
        resample_normalize_bucketed,
        resample_normalize_pallas,
    )

    vol = rng.normal(0, 500, size=(20, 24, 18)).astype(np.float32)
    ref = golden(np.clip(vol, -150, 250), (8, 8, 8))
    b = np.asarray(resample_normalize_bucketed(vol, (8, 8, 8),
                                               hu_window=(-150, 250)))
    np.testing.assert_allclose(b, ref, atol=2e-5)
    p = np.asarray(resample_normalize_pallas(vol, (8, 8, 8),
                                             hu_window=(-150, 250)))
    np.testing.assert_allclose(p, ref, atol=2e-5)


def test_hu_window_through_cohort_build(tmp_path, rng):
    """--hu-window path: build_cohort_arrays with a window produces clipped
    volumes (differs from unwindowed when out-of-window values exist)."""
    import pandas as pd

    from multimodal_survival_prediction_tpu.data.datasets import (
        build_cohort_arrays,
    )
    from multimodal_survival_prediction_tpu.data.nifti import write_nifti

    vol = rng.normal(0, 500, size=(16, 16, 12)).astype(np.float32)
    path = tmp_path / "v.nii.gz"
    write_nifti(path, vol)
    table = pd.DataFrame([dict(
        patient_id="P0", nifti_path=str(path), has_imaging=True,
        has_rnaseq=False, has_clinical=False, age=np.nan,
        survival_time=100.0, survival_status=1, has_survival=True)])
    a1 = build_cohort_arrays(table, None, with_image=True,
                             image_shape=(8, 8, 8))
    a2 = build_cohort_arrays(table, None, with_image=True,
                             image_shape=(8, 8, 8), hu_window=(-150, 250))
    assert a1.arrays["mask"][0, 0] == 1.0 and a2.arrays["mask"][0, 0] == 1.0
    assert not np.allclose(a1.arrays["image"], a2.arrays["image"])
    ref = golden(np.clip(vol, -150, 250), (8, 8, 8))
    np.testing.assert_allclose(a2.arrays["image"][0, ..., 0], ref, atol=2e-4)


def test_pallas_int16_native_dtype(rng):
    """Pallas path consumes int16 CTs natively (converted in-register; no
    f32 materialization pass) — matches the f32 XLA path bit-for-bit."""
    from multimodal_survival_prediction_tpu.ops.resample import (
        resample_normalize,
        resample_normalize_pallas,
    )

    vol = rng.integers(-1024, 3072, size=(24, 32, 16), dtype=np.int16)
    ref = np.asarray(resample_normalize(vol.astype(np.float32), (8, 8, 8)))
    out = np.asarray(resample_normalize_pallas(vol, (8, 8, 8)))
    np.testing.assert_allclose(out, ref, atol=2e-6)
    # golden vs scipy as well
    g = golden(vol.astype(np.float32), (8, 8, 8))
    np.testing.assert_allclose(out, g, atol=2e-5)
