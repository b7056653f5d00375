#!/usr/bin/env python
"""GDC genomic + clinical download (parity with reference scripts/download/
download_tcga.py): per data type, query the GDC `files` endpoint in patient
batches of 50 (URL-length workaround), write a TSV manifest, shell out to the
external `gdc-client download -m manifest -d dir` binary, and pull the full
clinical table via `cases` with expand=diagnoses,demographic,exposures."""

import json
import shutil
import subprocess
from pathlib import Path

from common import GDC_API, base_parser, require_requests

DATA_TYPES = {
    "rnaseq": "Gene Expression Quantification",
    "mutation": "Masked Somatic Mutation",
    "cnv": "Copy Number Segment",
}


def query_files(project, patients, data_type, batch=50):
    import requests

    hits = []
    for i in range(0, len(patients), batch):
        chunk = patients[i:i + batch]
        filters = {"op": "and", "content": [
            {"op": "in", "content": {"field": "cases.project.project_id",
                                     "value": [project]}},
            {"op": "in", "content": {"field": "cases.submitter_id",
                                     "value": chunk}},
            {"op": "in", "content": {"field": "data_type",
                                     "value": [data_type]}},
        ]}
        r = requests.post(
            f"{GDC_API}/files",
            json={"filters": filters,
                  "fields": "file_id,file_name,md5sum,file_size,state",
                  "size": 10000},
            timeout=120)
        r.raise_for_status()
        hits += r.json()["data"]["hits"]
    return hits


def write_manifest(hits, path: Path):
    lines = ["id\tfilename\tmd5\tsize\tstate"]
    for h in hits:
        lines.append(f"{h['file_id']}\t{h['file_name']}\t{h['md5sum']}"
                     f"\t{h['file_size']}\t{h.get('state', 'released')}")
    path.write_text("\n".join(lines) + "\n")


def find_gdc_client():
    for cand in ("gdc-client", "./gdc-client"):
        if shutil.which(cand):
            return shutil.which(cand)
    return None


def download_clinical(project, patients, out_csv: Path):
    import pandas as pd
    import requests

    filters = {"op": "in",
               "content": {"field": "project.project_id", "value": [project]}}
    r = requests.post(
        f"{GDC_API}/cases",
        json={"filters": filters, "expand": "diagnoses,demographic,exposures",
              "size": 10000},
        timeout=180)
    r.raise_for_status()
    rows = []
    for hit in r.json()["data"]["hits"]:
        row = {"submitter_id": hit.get("submitter_id")}
        for section in ("demographic",):
            for k, v in (hit.get(section) or {}).items():
                row[f"{section}.{k}"] = v
        diags = hit.get("diagnoses") or []
        if diags:
            for k, v in diags[0].items():
                row[f"diagnoses.{k}"] = v
        rows.append(row)
    df = pd.DataFrame(rows)
    if patients:
        df = df[df.submitter_id.isin(set(patients))]
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_csv, index=False)
    return len(df)


def main():
    p = base_parser(__doc__)
    p.add_argument("--types", default="rnaseq,mutation,cnv")
    args = p.parse_args()
    if not require_requests():
        return

    import pandas as pd

    root = Path(args.data_root)
    cohort_csv = root / "data" / "sampled_patients.csv"
    patients = (pd.read_csv(cohort_csv).iloc[:, 0].tolist()
                if cohort_csv.exists() else [])
    if not patients:
        print(f"no cohort at {cohort_csv}; run sample_patients.py first")
        return

    gdc_client = find_gdc_client()
    for key in args.types.split(","):
        data_type = DATA_TYPES[key.strip()]
        out_dir = root / "data" / "genomic" / key.strip()
        out_dir.mkdir(parents=True, exist_ok=True)
        try:
            hits = query_files(args.project, patients, data_type)
        except Exception as e:
            print(f"{key}: GDC API unreachable ({e})")
            continue
        manifest = out_dir / "manifest.tsv"
        write_manifest(hits, manifest)
        print(f"{key}: {len(hits)} files; manifest -> {manifest}")
        if gdc_client:
            subprocess.run(
                [gdc_client, "download", "-m", str(manifest),
                 "-d", str(out_dir)],
                check=False)
        else:
            print(f"{key}: gdc-client binary not found — manifest written, "
                  "download skipped")

    try:
        n = download_clinical(
            args.project, patients,
            root / "data" / "clinical" / "tcga_ov_multimodal_clinical.csv")
        print(f"clinical: {n} cohort rows")
    except Exception as e:
        print(f"clinical: GDC API unreachable ({e})")


if __name__ == "__main__":
    main()
