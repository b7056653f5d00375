"""Shared plumbing for analysis entry points."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--results-root", default="results")
    p.add_argument("--data-root", default=".",
                   help="root containing data/processed/full_matching_table.csv")
    p.add_argument("--out-dir", default=None)
    return p


def parse_hu_window(s):
    from multimodal_survival_prediction_tpu.utils import parse_hu_window as p

    return p(s)


def load_table_or_none(data_root):
    from multimodal_survival_prediction_tpu.data import load_matching_table

    path = Path(data_root) / "data" / "processed" / "full_matching_table.csv"
    return load_matching_table(path) if path.exists() else None
