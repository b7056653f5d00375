"""The full matching table — the pipeline's central data contract.

One row per patient with columns (reference create_full_matching_table.py:
124-134):

  patient_id, nifti_path, has_imaging, has_rnaseq, has_clinical,
  age, survival_time, survival_status, has_survival

Reproduced semantics (including the quirks documented in SURVEY §2.13 —
shipped behavior, not the README's description of it):

  * age = demographic.age_at_index, falling back to -days_to_birth/365.25
    (reference :30-37)
  * survival_time = demographic.days_to_death only; survival_status =
    (vital_status == 'Dead'). Censored patients keep NaN time, so
    has_survival ≈ died — days_to_last_follow_up is deliberately NOT used
    for the 608-cohort table (reference :52-59). The 109-cohort builder
    (create_multimodal_dataset.py:92-109) DOES use last-follow-up; that
    variant is ``survival_from_clinical_row(..., use_followup=True)``.
  * imaging = first .nii.gz under <nifti_root>/<patient_id>/ (reference
    :70-84); RNA-seq membership = presence in the mapped RNA matrix index
    (reference :87-97).
"""

from __future__ import annotations

import math
from pathlib import Path

import pandas as pd

MATCHING_COLUMNS = [
    "patient_id",
    "nifti_path",
    "has_imaging",
    "has_rnaseq",
    "has_clinical",
    "age",
    "survival_time",
    "survival_status",
    "has_survival",
]


def extract_age(row: pd.Series) -> float:
    """age_at_index with -days_to_birth/365.25 fallback."""
    age = row.get("demographic.age_at_index")
    if age is not None and not _isnan(age):
        return float(age)
    dtb = row.get("demographic.days_to_birth")
    if dtb is not None and not _isnan(dtb):
        return -float(dtb) / 365.25
    return float("nan")


def _isnan(x) -> bool:
    try:
        return math.isnan(float(x))
    except (TypeError, ValueError):
        return True


def survival_from_clinical_row(row: pd.Series, use_followup: bool = False):
    """Returns (survival_time, survival_status, has_survival).

    Default (608-cohort) semantics: only days_to_death counts; censored
    patients get NaN time and has_survival=False. With ``use_followup``
    (109-cohort semantics) censored patients get days_to_last_follow_up
    and event=0.
    """
    vital = str(row.get("demographic.vital_status", ""))
    dtd = row.get("demographic.days_to_death")
    if vital == "Dead" and dtd is not None and not _isnan(dtd):
        return float(dtd), 1, True
    if use_followup:
        fu = row.get("diagnoses.days_to_last_follow_up")
        if fu is not None and not _isnan(fu):
            return float(fu), 0, True
    status = 1 if vital == "Dead" else 0
    return float("nan"), status, False


def find_first_nifti(nifti_root, patient_id: str):
    pdir = Path(nifti_root) / patient_id
    if not pdir.is_dir():
        return None
    hits = sorted(pdir.glob("*.nii.gz")) or sorted(pdir.glob("*.nii"))
    return str(hits[0]) if hits else None


def build_full_matching_table(
    clinical_csv,
    nifti_root,
    rnaseq_csv,
    out_csv=None,
    use_followup: bool = False,
) -> pd.DataFrame:
    """Assemble the matching table from the three upstream artifacts."""
    clinical = pd.read_csv(clinical_csv)
    id_col = "submitter_id" if "submitter_id" in clinical.columns else "patient_id"
    rna_ids: set = set()
    if rnaseq_csv is not None and Path(rnaseq_csv).exists():
        rna_ids = set(pd.read_csv(rnaseq_csv, index_col=0, usecols=[0]).index)

    rows = []
    for _, crow in clinical.iterrows():
        pid = crow[id_col]
        nifti = find_first_nifti(nifti_root, pid) if nifti_root else None
        t, s, has_s = survival_from_clinical_row(crow, use_followup)
        rows.append(
            dict(
                patient_id=pid,
                nifti_path=nifti if nifti else "",
                has_imaging=nifti is not None,
                has_rnaseq=pid in rna_ids,
                has_clinical=not _isnan(extract_age(crow)),
                age=extract_age(crow),
                survival_time=t,
                survival_status=s,
                has_survival=has_s,
            )
        )
    table = pd.DataFrame(rows, columns=MATCHING_COLUMNS)
    if out_csv is not None:
        Path(out_csv).parent.mkdir(parents=True, exist_ok=True)
        table.to_csv(out_csv, index=False)
    return table


def load_matching_table(path) -> pd.DataFrame:
    df = pd.read_csv(path)
    for col in ("has_imaging", "has_rnaseq", "has_clinical", "has_survival"):
        if df[col].dtype == object:
            df[col] = df[col].astype(str).str.lower().isin(("true", "1"))
        else:
            df[col] = df[col].astype(bool)
    return df


def cohort_stats(table: pd.DataFrame) -> dict:
    """The dataset_info block of results/final_comparison/results.json."""
    complete = table.has_imaging & table.has_rnaseq & table.has_clinical & table.has_survival
    return {
        "total_patients": int(len(table)),
        "with_imaging": int(table.has_imaging.sum()),
        "with_rnaseq": int(table.has_rnaseq.sum()),
        "with_clinical": int(table.has_clinical.sum()),
        "with_survival": int(table.has_survival.sum()),
        "complete_multimodal": int(complete.sum()),
    }
