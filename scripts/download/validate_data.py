#!/usr/bin/env python
"""Per-patient data completeness validation (parity with reference
scripts/download/validate_data.py): imaging = patient dir exists with >=1
series subdir; RNA-seq/mutation/CNV = coarse directory-level presence (the
reference checks only that the modality dir exists at all, :57-59 — both the
coarse reference rule and a strict per-patient rule are provided); clinical =
patient present in the clinical CSV. Writes validation_results.csv,
multimodal_patients.csv (complete patients), data_summary.json with disk
usage."""

import json
from pathlib import Path

from common import base_parser


def dir_size(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file()) \
        if path.is_dir() else 0


def main():
    p = base_parser(__doc__)
    p.add_argument("--strict", action="store_true",
                   help="per-patient genomic presence instead of the "
                        "reference's coarse directory check")
    args = p.parse_args()

    import pandas as pd

    root = Path(args.data_root) / "data"
    cohort_csv = root / "sampled_patients.csv"
    if not cohort_csv.exists():
        print(f"no cohort at {cohort_csv}")
        return
    patients = pd.read_csv(cohort_csv).iloc[:, 0].tolist()

    clin_csv = next(iter(sorted((root / "clinical").glob("*.csv"))), None)
    clinical_ids = set()
    if clin_csv is not None:
        cdf = pd.read_csv(clin_csv)
        idc = "submitter_id" if "submitter_id" in cdf.columns else cdf.columns[0]
        clinical_ids = set(cdf[idc])

    dicom_root = root / "imaging" / "dicom"
    rnaseq_dir = root / "genomic" / "rnaseq"
    mut_dir = root / "genomic" / "mutation"
    cnv_dir = root / "genomic" / "cnv"

    rows = []
    for pid in patients:
        pdir = dicom_root / pid
        has_imaging = pdir.is_dir() and any(d.is_dir() for d in pdir.iterdir())
        if args.strict:
            has_rna = any(rnaseq_dir.rglob(f"*{pid}*")) if rnaseq_dir.is_dir() else False
            has_mut = any(mut_dir.rglob(f"*{pid}*")) if mut_dir.is_dir() else False
            has_cnv = any(cnv_dir.rglob(f"*{pid}*")) if cnv_dir.is_dir() else False
        else:  # reference's coarse rule (validate_data.py:57-59)
            has_rna = rnaseq_dir.is_dir()
            has_mut = mut_dir.is_dir()
            has_cnv = cnv_dir.is_dir()
        rows.append(dict(
            patient_id=pid, has_imaging=has_imaging, has_rnaseq=has_rna,
            has_mutation=has_mut, has_cnv=has_cnv,
            has_clinical=pid in clinical_ids,
            complete=all([has_imaging, has_rna, pid in clinical_ids]),
        ))

    df = pd.DataFrame(rows)
    df.to_csv(root / "validation_results.csv", index=False)
    df[df.complete][["patient_id"]].to_csv(
        root / "multimodal_patients.csv", index=False)

    summary = {
        "total_patients": len(df),
        "with_imaging": int(df.has_imaging.sum()),
        "with_rnaseq": int(df.has_rnaseq.sum()),
        "with_clinical": int(df.has_clinical.sum()),
        "complete": int(df.complete.sum()),
        "disk_usage_bytes": {
            "imaging": dir_size(root / "imaging"),
            "genomic": dir_size(root / "genomic"),
            "clinical": dir_size(root / "clinical"),
        },
    }
    (root / "data_summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
