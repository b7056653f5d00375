#!/usr/bin/env python
"""Map RNA-seq file UUIDs to TCGA patient ids via the GDC API (parity with
reference scripts/preprocessing/map_rnaseq_via_gdc_api.py): query the GDC
`files` endpoint in batches of 100 UUIDs for cases.submitter_id, remap the
matrix index, drop duplicate patients (keep first), write
rnaseq_normalized_mapped.csv + case_uuid_to_patient.json.

Network access is gated: without connectivity (or with --mapping-json) a
local UUID->patient JSON can be supplied instead."""

import json
from pathlib import Path

from common import base_parser

GDC_FILES_ENDPOINT = "https://api.gdc.cancer.gov/files"


def fetch_uuid_mapping(uuids, batch_size=100):
    import requests

    mapping = {}
    for i in range(0, len(uuids), batch_size):
        batch = uuids[i:i + batch_size]
        payload = {
            "filters": {"op": "in",
                        "content": {"field": "file_id", "value": batch}},
            "fields": "file_id,cases.submitter_id",
            "size": len(batch),
        }
        r = requests.post(GDC_FILES_ENDPOINT, json=payload, timeout=60)
        r.raise_for_status()
        for hit in r.json()["data"]["hits"]:
            cases = hit.get("cases") or []
            if cases:
                mapping[hit["file_id"]] = cases[0]["submitter_id"]
    return mapping


def main():
    p = base_parser(__doc__)
    p.add_argument("--mapping-json", default=None,
                   help="offline UUID->patient mapping (skips the GDC API)")
    args = p.parse_args()

    import pandas as pd

    root = Path(args.data_root)
    proc = root / "data" / "processed"
    src = proc / "rnaseq_normalized.csv"
    if not src.exists():
        print(f"missing {src}; run preprocess_genomic.py first")
        return
    df = pd.read_csv(src, index_col=0)

    if args.mapping_json:
        mapping = json.loads(Path(args.mapping_json).read_text())
    else:
        try:
            mapping = fetch_uuid_mapping(list(df.index))
        except Exception as e:
            print(f"GDC API unavailable ({e}); supply --mapping-json")
            return

    mapped = df[df.index.isin(mapping)].rename(index=mapping)
    mapped = mapped[~mapped.index.duplicated(keep="first")]
    mapped.to_csv(proc / "rnaseq_normalized_mapped.csv")
    (proc / "case_uuid_to_patient.json").write_text(
        json.dumps(mapping, indent=2))
    print(f"mapped {len(mapped)}/{len(df)} samples -> "
          f"{proc/'rnaseq_normalized_mapped.csv'}")


if __name__ == "__main__":
    main()
