"""Shared plumbing for the download entry points.

These scripts are host-side network clients (GDC / TCIA REST APIs and the
external gdc-client binary) — not perf-relevant, kept as gated subprocess/
requests code like the reference (SURVEY §2.1, §2.10). All network calls are
wrapped so a zero-egress environment degrades with a clear message instead of
a stack trace."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

GDC_API = "https://api.gdc.cancer.gov"
TCIA_API = "https://services.cancerimagingarchive.net/nbia-api/services/v1"


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--data-root", default=".")
    p.add_argument("--project", default="TCGA-OV")
    p.add_argument("--yes", action="store_true",
                   help="skip interactive confirmations")
    return p


def require_requests():
    try:
        import requests  # noqa: F401

        return True
    except ImportError:
        print("the 'requests' package is unavailable in this environment; "
              "download scripts need network access + requests")
        return False
