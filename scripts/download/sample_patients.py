#!/usr/bin/env python
"""Cohort sampling (parity with reference scripts/download/sample_patients.py):
query GDC `cases` for all project patients, TCIA for imaging patients,
intersect, random-sample SAMPLE_SIZE with seed 42, write
data/sampled_patients.csv + all_common_patients.csv + sampling_summary.json."""

import json
import random
from pathlib import Path

from common import GDC_API, TCIA_API, base_parser, require_requests


def gdc_project_patients(project: str):
    import requests

    filters = {"op": "in",
               "content": {"field": "project.project_id", "value": [project]}}
    r = requests.post(
        f"{GDC_API}/cases",
        json={"filters": filters, "fields": "submitter_id", "size": 10000},
        timeout=120)
    r.raise_for_status()
    return sorted({h["submitter_id"] for h in r.json()["data"]["hits"]})


def tcia_collection_patients(collection: str):
    import requests

    r = requests.get(f"{TCIA_API}/getPatient",
                     params={"Collection": collection}, timeout=120)
    r.raise_for_status()
    return sorted({p["PatientId"] for p in r.json()})


def main():
    p = base_parser(__doc__)
    p.add_argument("--sample-size", type=int, default=609)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    if not require_requests():
        return

    import pandas as pd

    root = Path(args.data_root) / "data"
    root.mkdir(parents=True, exist_ok=True)
    try:
        gdc = gdc_project_patients(args.project)
        tcia = tcia_collection_patients(args.project)
    except Exception as e:
        print(f"API unreachable ({e}); this environment has no egress")
        return

    common = sorted(set(gdc) & set(tcia))
    pd.DataFrame({"patient_id": common}).to_csv(
        root / "all_common_patients.csv", index=False)

    random.seed(args.seed)
    sample = (random.sample(common, args.sample_size)
              if len(common) > args.sample_size else common)
    pd.DataFrame({"patient_id": sorted(sample)}).to_csv(
        root / "sampled_patients.csv", index=False)

    summary = {"project": args.project, "gdc_patients": len(gdc),
               "tcia_patients": len(tcia), "common": len(common),
               "sampled": len(sample), "seed": args.seed}
    (root / "sampling_summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
