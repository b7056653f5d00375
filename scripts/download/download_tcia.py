#!/usr/bin/env python
"""TCIA CT imaging download (parity with reference scripts/download/
download_tcia.py): fetch the collection's series list, filter to the cohort,
write per-series metadata CSVs + a size estimate, confirm (interactive y/n
unless --yes), then download each series as DICOM with per-series failure
accounting in download_summary.json."""

import io
import json
import zipfile
from pathlib import Path

from common import TCIA_API, base_parser, require_requests


def get_series(collection: str):
    import requests

    r = requests.get(f"{TCIA_API}/getSeries",
                     params={"Collection": collection}, timeout=180)
    r.raise_for_status()
    return r.json()


def download_series(series_uid: str, out_dir: Path):
    import requests

    r = requests.get(f"{TCIA_API}/getImage",
                     params={"SeriesInstanceUID": series_uid}, timeout=600)
    r.raise_for_status()
    out_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(io.BytesIO(r.content)) as z:
        z.extractall(out_dir)


def main():
    args = base_parser(__doc__).parse_args()
    if not require_requests():
        return

    import pandas as pd

    root = Path(args.data_root)
    cohort_csv = root / "data" / "sampled_patients.csv"
    cohort = (set(pd.read_csv(cohort_csv).iloc[:, 0])
              if cohort_csv.exists() else None)

    try:
        series = get_series(args.project)
    except Exception as e:
        print(f"TCIA API unreachable ({e}); this environment has no egress")
        return

    df = pd.DataFrame(series)
    if cohort is not None and "PatientID" in df.columns:
        df = df[df.PatientID.isin(cohort)]
    img_root = root / "data" / "imaging"
    img_root.mkdir(parents=True, exist_ok=True)
    df.to_csv(img_root / "series_metadata.csv", index=False)

    per_patient = df.groupby("PatientID").agg(
        n_series=("SeriesInstanceUID", "count")) if len(df) else None
    if per_patient is not None:
        per_patient.to_csv(img_root / "patient_series_summary.csv")

    total_gb = df.get("TotalSizeInBytes", pd.Series(dtype=float)).sum() / 1e9
    print(f"{len(df)} series / {df.PatientID.nunique() if len(df) else 0} "
          f"patients, est. {total_gb:.1f} GB")
    if not args.yes:
        if input("download? [y/N] ").strip().lower() != "y":
            print("aborted")
            return

    ok, failed = 0, []
    for _, row in df.iterrows():
        uid = row.SeriesInstanceUID
        out = img_root / "dicom" / row.PatientID / uid
        try:
            download_series(uid, out)
            ok += 1
        except Exception as e:
            failed.append({"series": uid, "error": str(e)[:200]})
        print(f"[{ok + len(failed)}/{len(df)}] {row.PatientID} "
              f"{'ok' if not failed or failed[-1]['series'] != uid else 'FAILED'}")

    summary = {"requested": int(len(df)), "downloaded": ok,
               "failed": failed}
    (img_root / "download_summary.json").write_text(
        json.dumps(summary, indent=2))
    print(f"done: {ok}/{len(df)} series")


if __name__ == "__main__":
    main()
