"""Synthetic TCGA-OV-like cohort generator (SURVEY §4 test strategy item 3).

Fabricates everything the training layer consumes — per-patient NIfTI CT
volumes, a 5,005-gene RNA matrix CSV, a clinical CSV, and the full matching
table — with the reference cohort's *shape*: 608 patients, ~142 imaging,
~427 RNA, ~587 clinical, ~348 survival-labeled (events only, per the
censoring quirk). Survival times carry planted signal (a linear risk on a
gene subset + an imaging intensity effect) so models can beat C-index 0.5.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd

from .matching_table import build_full_matching_table
from .nifti import write_nifti

RNA_DIM = 5005  # shipped matrix width (SURVEY §2.13)


@dataclass
class SyntheticCohortSpec:
    n_patients: int = 64
    p_imaging: float = 0.25
    p_rnaseq: float = 0.7
    p_clinical: float = 0.95
    p_dead: float = 0.57  # -> has_survival fraction (608-cohort: 348/608)
    rna_dim: int = RNA_DIM
    image_shapes: tuple = ((48, 96, 96), (32, 80, 80), (40, 64, 64))
    seed: int = 42


def generate_synthetic_cohort(root, spec: SyntheticCohortSpec | None = None):
    """Writes the phase-2 artifact set under `root`:

      data/clinical/clinical.csv
      data/imaging/nifti/<pid>/series_00.nii.gz
      data/processed/rnaseq_normalized_mapped.csv
      data/processed/full_matching_table.csv

    Returns (matching_table_df, paths_dict).
    """
    spec = spec or SyntheticCohortSpec()
    rng = np.random.default_rng(spec.seed)
    root = Path(root)
    clin_dir = root / "data" / "clinical"
    nifti_root = root / "data" / "imaging" / "nifti"
    proc = root / "data" / "processed"
    for d in (clin_dir, nifti_root, proc):
        d.mkdir(parents=True, exist_ok=True)

    pids = [f"TCGA-SY-{i:04d}" for i in range(spec.n_patients)]
    has_img = rng.uniform(size=spec.n_patients) < spec.p_imaging
    has_rna = rng.uniform(size=spec.n_patients) < spec.p_rnaseq
    has_clin = rng.uniform(size=spec.n_patients) < spec.p_clinical
    dead = rng.uniform(size=spec.n_patients) < spec.p_dead

    # --- planted risk signal ---
    gene_expr = rng.normal(size=(spec.n_patients, spec.rna_dim)).astype(np.float32)
    beta = np.zeros(spec.rna_dim, np.float32)
    beta[:20] = rng.normal(scale=0.5, size=20)
    risk = gene_expr @ beta
    base_time = rng.exponential(scale=1000.0, size=spec.n_patients)
    surv_days = np.maximum(base_time * np.exp(-0.5 * risk), 5.0)

    # --- clinical CSV (GDC-expanded column names) ---
    age = rng.uniform(35, 85, size=spec.n_patients).round(0)
    clin_rows = []
    for i, pid in enumerate(pids):
        row = {
            "submitter_id": pid,
            "demographic.vital_status": "Dead" if dead[i] else "Alive",
            "demographic.age_at_index": age[i] if has_clin[i] else np.nan,
            "demographic.days_to_birth": -age[i] * 365.25,
            "demographic.days_to_death": surv_days[i] if dead[i] else np.nan,
            "diagnoses.days_to_last_follow_up": (
                np.nan if dead[i] else surv_days[i] * rng.uniform(0.3, 1.0)
            ),
        }
        if not has_clin[i]:
            row["demographic.age_at_index"] = np.nan
            row["demographic.days_to_birth"] = np.nan
        clin_rows.append(row)
    clinical_csv = clin_dir / "clinical.csv"
    pd.DataFrame(clin_rows).to_csv(clinical_csv, index=False)

    # --- RNA matrix for patients that have it ---
    rna_index = [pid for i, pid in enumerate(pids) if has_rna[i]]
    rna = gene_expr[has_rna]
    genes = [f"ENSG{j:011d}" for j in range(spec.rna_dim)]
    rnaseq_csv = proc / "rnaseq_normalized_mapped.csv"
    pd.DataFrame(rna, index=rna_index, columns=genes).to_csv(rnaseq_csv)

    # --- NIfTI volumes; intensity correlates (weakly) with risk ---
    for i, pid in enumerate(pids):
        if not has_img[i]:
            continue
        shape = spec.image_shapes[i % len(spec.image_shapes)]
        vol = rng.normal(loc=100 + 20 * risk[i], scale=50, size=shape)
        vol = vol.astype(np.float32)
        pdir = nifti_root / pid
        pdir.mkdir(exist_ok=True)
        write_nifti(pdir / "series_00.nii.gz", vol,
                    spacing=(0.7, 0.7, 2.5))

    table = build_full_matching_table(
        clinical_csv, nifti_root, rnaseq_csv,
        out_csv=proc / "full_matching_table.csv",
    )
    paths = {
        "root": root,
        "clinical_csv": clinical_csv,
        "nifti_root": nifti_root,
        "rnaseq_csv": rnaseq_csv,
        "matching_table": proc / "full_matching_table.csv",
    }
    return table, paths
