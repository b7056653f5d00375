"""NIfTI round-trip + synthetic cohort integrity tests."""

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.data import (
    generate_synthetic_cohort,
    load_matching_table,
    read_nifti,
    write_nifti,
)
from multimodal_survival_prediction_tpu.data.matching_table import cohort_stats
from multimodal_survival_prediction_tpu.data.synthetic import SyntheticCohortSpec


def test_nifti_roundtrip(tmp_path, rng):
    vol = rng.normal(100, 30, size=(12, 20, 24)).astype(np.float32)
    p = tmp_path / "x.nii.gz"
    write_nifti(p, vol, spacing=(0.7, 0.7, 2.5), origin=(1.0, 2.0, 3.0))
    img = read_nifti(p)
    np.testing.assert_array_equal(img.data, vol)
    assert img.spacing == pytest.approx((0.7, 0.7, 2.5))
    assert img.origin == pytest.approx((1.0, 2.0, 3.0))


def test_nifti_roundtrip_int16_uncompressed(tmp_path, rng):
    vol = rng.integers(-1000, 3000, size=(5, 7, 9)).astype(np.int16)
    p = tmp_path / "x.nii"
    write_nifti(p, vol)
    img = read_nifti(p)
    np.testing.assert_array_equal(img.data, vol)
    assert img.data.dtype == np.int16


def test_synthetic_cohort(tmp_path):
    spec = SyntheticCohortSpec(n_patients=24, seed=7)
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    assert len(table) == 24
    stats = cohort_stats(table)
    assert stats["total_patients"] == 24
    assert 0 < stats["with_imaging"] < 24
    assert stats["with_survival"] <= stats["total_patients"]
    # censoring quirk: has_survival == survival_status==1 rows only
    assert (table.has_survival == (table.survival_status == 1)).all()
    # reload from disk gives the same table
    reloaded = load_matching_table(paths["matching_table"])
    assert (reloaded.patient_id == table.patient_id).all()
    assert (reloaded.has_imaging == table.has_imaging).all()
    # every imaging patient's nifti is readable with the expected spacing
    for _, row in reloaded[reloaded.has_imaging].iterrows():
        img = read_nifti(row.nifti_path)
        assert img.data.ndim == 3
        assert img.spacing == pytest.approx((0.7, 0.7, 2.5))
