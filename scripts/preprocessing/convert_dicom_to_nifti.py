#!/usr/bin/env python
"""DICOM -> NIfTI conversion (parity with reference scripts/preprocessing/
convert_dicom_to_nifti.py): per patient, per series directory, assemble the
slice stack, write data/imaging/nifti/<pid>/series_{idx:02d}.nii.gz, record
geometry + the 7 DICOM tags per series as JSON, and summarize to
conversion_results.csv — using the built-in DICOM parser instead of
SimpleITK."""

import json
from pathlib import Path

from common import base_parser


def main():
    p = base_parser(__doc__)
    p.add_argument("--dicom-root", default=None)
    p.add_argument("--nifti-root", default=None)
    args = p.parse_args()

    import pandas as pd

    from multimodal_survival_prediction_tpu.data.nifti import write_nifti
    from multimodal_survival_prediction_tpu.preprocess.dicom import (
        read_dicom_series,
    )

    root = Path(args.data_root)
    dicom_root = Path(args.dicom_root or root / "data" / "imaging" / "dicom")
    nifti_root = Path(args.nifti_root or root / "data" / "imaging" / "nifti")

    if not dicom_root.is_dir():
        print(f"no DICOM directory at {dicom_root}")
        return

    rows = []
    for pdir in sorted(d for d in dicom_root.iterdir() if d.is_dir()):
        pid = pdir.name
        out_dir = nifti_root / pid
        series_dirs = sorted(d for d in pdir.iterdir() if d.is_dir()) or [pdir]
        for idx, sdir in enumerate(series_dirs):
            rec = dict(patient_id=pid, series_dir=str(sdir), series_index=idx,
                       status="ok", error="")
            try:
                series = read_dicom_series(sdir)
                out_dir.mkdir(parents=True, exist_ok=True)
                out_path = out_dir / f"series_{idx:02d}.nii.gz"
                write_nifti(out_path, series.volume,
                            spacing=series.spacing, origin=series.origin)
                meta = dict(series.metadata)
                meta.update(
                    spacing=list(series.spacing),
                    origin=list(series.origin),
                    output=str(out_path),
                )
                (out_dir / f"series_{idx:02d}_metadata.json").write_text(
                    json.dumps(meta, indent=2))
                rec.update(output=str(out_path),
                           num_slices=series.metadata["num_slices"])
            except Exception as e:
                rec.update(status="failed", error=str(e)[:300])
            rows.append(rec)
            print(f"{pid} series {idx}: {rec['status']}")

    df = pd.DataFrame(rows)
    nifti_root.mkdir(parents=True, exist_ok=True)
    df.to_csv(nifti_root / "conversion_results.csv", index=False)
    ok = int((df.status == "ok").sum()) if len(df) else 0
    print(f"\nconverted {ok}/{len(df)} series -> {nifti_root}")


if __name__ == "__main__":
    main()
