"""Genomic preprocessing: RNA-seq normalization, mutation/CNV matrices.

Capabilities of reference scripts/preprocessing/preprocess_genomic.py:
  * scan data/genomic/rnaseq/<uuid>/ for STAR gene-counts TSVs; pick the
    'unstranded' or 'tpm_unstranded' count column, else the last numeric
    column (:45-88)
  * strip ENSG version suffixes; samples x genes matrix
  * log2(x+1) -> per-gene z-score -> top-K genes by variance (:104-138;
    K defaults to 5000 but the shipped matrix has 5,005 columns — both are
    supported, SURVEY §2.13)
  * mutation MAF -> per-patient binary gene-mutation matrix keyed on
    Tumor_Sample_Barcode[:12] (:151-197)
  * CNV segment concatenation (:209-239)
"""

from __future__ import annotations

import gzip
import logging
from pathlib import Path

import numpy as np
import pandas as pd

log = logging.getLogger(__name__)

PREFERRED_COUNT_COLUMNS = ("unstranded", "tpm_unstranded", "tpm")


def read_star_counts_tsv(path) -> pd.Series | None:
    """One STAR gene-counts TSV -> Series(gene_id -> count), or None."""
    opener = gzip.open if str(path).endswith(".gz") else open
    try:
        with opener(path, "rt") as f:
            df = pd.read_csv(f, sep="\t", comment="#")
    except Exception as e:
        log.warning("unreadable counts file %s: %s", path, e)
        return None
    if "gene_id" not in df.columns:
        return None
    # drop STAR summary rows (N_unmapped etc.)
    df = df[~df.gene_id.astype(str).str.startswith("N_")]
    col = next((c for c in PREFERRED_COUNT_COLUMNS if c in df.columns),
               df.columns[-1])
    s = pd.Series(
        pd.to_numeric(df[col], errors="coerce").to_numpy(),
        index=df.gene_id.astype(str).str.replace(r"\.\d+$", "", regex=True),
    )
    return s.dropna()


def build_rnaseq_matrix(rnaseq_root) -> pd.DataFrame:
    """Scan <root>/<uuid>/ dirs for counts TSVs -> (samples x genes) frame
    indexed by file UUID (patient mapping happens separately via GDC)."""
    rows = {}
    root = Path(rnaseq_root)
    for d in sorted(p for p in root.iterdir() if p.is_dir()):
        tsvs = sorted(
            list(d.glob("*.tsv")) + list(d.glob("*.tsv.gz"))
            + list(d.glob("*counts*"))
        )
        for t in tsvs:
            s = read_star_counts_tsv(t)
            if s is not None and len(s):
                rows[d.name] = s
                break
    if not rows:
        return pd.DataFrame()
    return pd.DataFrame(rows).T.sort_index(axis=1)


def normalize_rnaseq(matrix: pd.DataFrame, top_k: int = 5000,
                     eps: float = 1e-8):
    """log2(x+1) -> per-gene z-score -> top_k genes by variance.

    Returns (normalized frame, selected gene list)."""
    x = np.log2(matrix.to_numpy(np.float64) + 1.0)
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    z = (x - mean) / (std + eps)
    var = z.var(axis=0)
    k = min(top_k, z.shape[1])
    top = np.argsort(var)[::-1][:k]
    top = np.sort(top)  # keep gene order stable
    genes = [matrix.columns[i] for i in top]
    out = pd.DataFrame(z[:, top], index=matrix.index, columns=genes)
    return out, genes


def mutation_matrix_from_maf(maf_path, min_patients: int = 0) -> pd.DataFrame:
    """MAF -> binary (patients x genes) mutation matrix.

    Patient id = Tumor_Sample_Barcode[:12] (TCGA-XX-XXXX)."""
    opener = gzip.open if str(maf_path).endswith(".gz") else open
    with opener(maf_path, "rt") as f:
        maf = pd.read_csv(f, sep="\t", comment="#", low_memory=False)
    need = {"Hugo_Symbol", "Tumor_Sample_Barcode"}
    if not need <= set(maf.columns):
        raise ValueError(f"MAF missing columns {need - set(maf.columns)}")
    maf = maf.assign(patient=maf.Tumor_Sample_Barcode.str[:12])
    mat = pd.crosstab(maf.patient, maf.Hugo_Symbol).clip(upper=1)
    if min_patients:
        mat = mat.loc[:, mat.sum(axis=0) >= min_patients]
    return mat


def concat_cnv_segments(cnv_root) -> pd.DataFrame:
    """Concatenate raw CNV segment files (reference keeps them raw)."""
    frames = []
    for p in sorted(Path(cnv_root).rglob("*.txt")) + sorted(
            Path(cnv_root).rglob("*.tsv")):
        try:
            frames.append(pd.read_csv(p, sep="\t"))
        except Exception as e:
            log.warning("skipping CNV file %s: %s", p, e)
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
