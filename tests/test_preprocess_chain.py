"""Full preprocessing-chain integration test: fabricated raw DICOM/counts/
clinical -> NIfTI -> normalized RNA -> UUID mapping -> matching table ->
trainable arrays (SURVEY §2.2 end to end, no network)."""

import json

import numpy as np
import pandas as pd
import pytest

from multimodal_survival_prediction_tpu.data.datasets import (
    build_cohort_arrays,
    load_rnaseq_matrix,
    select_cohort,
)
from multimodal_survival_prediction_tpu.data.matching_table import (
    build_full_matching_table,
    cohort_stats,
)
from multimodal_survival_prediction_tpu.data.nifti import write_nifti
from multimodal_survival_prediction_tpu.preprocess.dicom import (
    read_dicom_series,
    write_dicom_slice,
)
from multimodal_survival_prediction_tpu.preprocess.genomic import (
    build_rnaseq_matrix,
    normalize_rnaseq,
)


def test_raw_to_training_arrays(tmp_path, rng):
    pids = [f"TCGA-XX-{i:04d}" for i in range(5)]

    # raw DICOM for 3 patients
    nifti_root = tmp_path / "nifti"
    for pid in pids[:3]:
        sdir = tmp_path / "dicom" / pid / "s1"
        sdir.mkdir(parents=True)
        for z in range(5):
            write_dicom_slice(
                sdir / f"{z}.dcm",
                rng.integers(-400, 1200, size=(20, 20)).astype(np.int16),
                instance=z, position=(0, 0, 2.5 * z))
        series = read_dicom_series(sdir)
        out = nifti_root / pid
        out.mkdir(parents=True)
        write_nifti(out / "series_00.nii.gz", series.volume,
                    spacing=series.spacing)

    # raw RNA counts for 4 patients -> normalize -> map uuid->patient
    genes = [f"ENSG{j:011d}.2" for j in range(40)]
    for i in range(4):
        d = tmp_path / "rnaseq" / f"uuid-{i}"
        d.mkdir(parents=True)
        pd.DataFrame({"gene_id": genes,
                      "unstranded": rng.integers(0, 900, size=40)}
                     ).to_csv(d / "c.tsv", sep="\t", index=False)
    mat = build_rnaseq_matrix(tmp_path / "rnaseq")
    norm, selected = normalize_rnaseq(mat, top_k=25)
    mapping = {f"uuid-{i}": pids[i] for i in range(4)}
    mapped = norm.rename(index=mapping)
    rnaseq_csv = tmp_path / "rnaseq_normalized_mapped.csv"
    mapped.to_csv(rnaseq_csv)

    # clinical
    clin = pd.DataFrame([
        {"submitter_id": pid,
         "demographic.vital_status": "Dead" if i % 2 == 0 else "Alive",
         "demographic.age_at_index": 55 + i,
         "demographic.days_to_death": 400 + 30 * i if i % 2 == 0 else None}
        for i, pid in enumerate(pids)])
    clin_csv = tmp_path / "clinical.csv"
    clin.to_csv(clin_csv, index=False)

    table = build_full_matching_table(clin_csv, nifti_root, rnaseq_csv)
    stats = cohort_stats(table)
    assert stats["total_patients"] == 5
    assert stats["with_imaging"] == 3
    assert stats["with_rnaseq"] == 4
    assert stats["with_survival"] == 3  # the censoring quirk: only deaths

    cohort = select_cohort(table, "partial_modality")
    arrays = build_cohort_arrays(cohort, load_rnaseq_matrix(rnaseq_csv),
                                 with_image=True, image_shape=(8, 8, 8))
    assert arrays.arrays["image"].shape == (5, 8, 8, 8, 1)
    assert arrays.arrays["rnaseq"].shape == (5, 25)
    assert arrays.arrays["mask"][:, 0].sum() == 3  # image mask from files
    assert arrays.arrays["mask"][:, 1].sum() == 4
    assert np.isfinite(arrays.arrays["image"]).all()
    # images normalized to [0, 1]
    imaged = arrays.arrays["mask"][:, 0] > 0
    assert arrays.arrays["image"][imaged].max() <= 1.0 + 1e-5


def test_nan_survival_status_does_not_poison_arrays():
    """An unlabeled row with a NaN survival_status (plausible in a
    user-supplied table) must become event=0.0 — the Cox loss masks invalid
    rows by MULTIPLYING event by svalid, and 0 * NaN is NaN, so one such row
    would poison every batch containing it."""
    table = pd.DataFrame([
        {"patient_id": "P1", "age": 60.0, "survival_time": 400.0,
         "survival_status": 1.0, "has_survival": True,
         "has_rnaseq": False, "has_imaging": False},
        {"patient_id": "P2", "age": np.nan, "survival_time": np.nan,
         "survival_status": np.nan, "has_survival": False,
         "has_rnaseq": False, "has_imaging": False},
    ])
    arrays = build_cohort_arrays(table, None, with_image=False)
    a = arrays.arrays
    np.testing.assert_array_equal(a["event"], [1.0, 0.0])
    np.testing.assert_array_equal(a["svalid"], [1.0, 0.0])
    for k, v in a.items():
        assert np.isfinite(v).all(), k


def test_labeled_nan_survival_status_raises():
    """A LABELED row (has_survival=True) with NaN survival_status is
    contradictory upstream data: zero-filling it would silently train the
    row as censored (label corruption), so the builder must fail loudly."""
    table = pd.DataFrame([
        {"patient_id": "P1", "age": 60.0, "survival_time": 400.0,
         "survival_status": np.nan, "has_survival": True,
         "has_rnaseq": False, "has_imaging": False},
    ])
    with pytest.raises(ValueError, match="survival_status"):
        build_cohort_arrays(table, None, with_image=False)
