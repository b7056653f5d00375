"""DICOM parser tests: round-trip via our writer, series assembly, genomics."""

import numpy as np
import pandas as pd
import pytest

from multimodal_survival_prediction_tpu.preprocess.dicom import (
    read_dicom,
    read_dicom_series,
    write_dicom_slice,
)
from multimodal_survival_prediction_tpu.preprocess.genomic import (
    mutation_matrix_from_maf,
    normalize_rnaseq,
    read_star_counts_tsv,
)


def test_dicom_slice_roundtrip(tmp_path, rng):
    px = rng.integers(-1000, 2000, size=(32, 48)).astype(np.int16)
    write_dicom_slice(tmp_path / "s.dcm", px, instance=1,
                      slope=2.0, intercept=-1024.0)
    sl = read_dicom(tmp_path / "s.dcm")
    np.testing.assert_allclose(sl.pixels, px.astype(np.float32) * 2 - 1024)


def test_dicom_implicit_le_with_preamble(tmp_path, rng):
    """A preamble file whose DATASET is implicit-VR-LE (transfer syntax
    1.2.840.10008.1.2 — common for TCGA CT) must be readable: the group-0002
    meta walk has to stop at the dataset boundary instead of misparsing
    implicit payload bytes as explicit VRs (garbage lengths -> struct.error
    on a valid file)."""
    import struct

    from multimodal_survival_prediction_tpu.preprocess import dicom as d

    px = rng.integers(-1000, 2000, size=(8, 10)).astype(np.int16)

    def imp(tag, value):
        if len(value) % 2:
            value += b"\x00"
        return struct.pack("<HHI", tag[0], tag[1], len(value)) + value

    def exp(tag, vr, value):  # explicit VR (file meta group is always so)
        if len(value) % 2:
            value += b"\x00"
        return struct.pack("<HH2sH", tag[0], tag[1], vr, len(value)) + value

    meta = exp(d.TRANSFER_SYNTAX, b"UI", d.IMPLICIT_LE.encode())
    body = b"".join([
        imp(d.ROWS, struct.pack("<H", px.shape[0])),
        imp(d.COLS, struct.pack("<H", px.shape[1])),
        imp(d.BITS_ALLOCATED, struct.pack("<H", 16)),
        imp(d.PIXEL_REPRESENTATION, struct.pack("<H", 1)),
        imp(d.PIXEL_DATA, px.tobytes()),
    ])
    p = tmp_path / "imp.dcm"
    p.write_bytes(b"\x00" * 128 + b"DICM" + meta + body)
    sl = d.read_dicom(p)
    np.testing.assert_allclose(sl.pixels, px.astype(np.float32))


def test_series_assembly_sorts_by_position(tmp_path, rng):
    # write slices in shuffled order; positions give the true order
    vols = rng.integers(-100, 100, size=(5, 16, 16)).astype(np.int16)
    order = [3, 0, 4, 1, 2]
    for i, z in enumerate(order):
        write_dicom_slice(tmp_path / f"slice_{i}.dcm", vols[z],
                          instance=i, position=(0, 0, 2.5 * z),
                          spacing=(0.7, 0.7), thickness=2.5)
    series = read_dicom_series(tmp_path)
    assert series.volume.shape == (5, 16, 16)
    np.testing.assert_allclose(series.volume, vols.astype(np.float32))
    assert series.spacing == pytest.approx((0.7, 0.7, 2.5))
    assert series.metadata["modality"] == "CT"
    assert series.metadata["num_slices"] == 5


def test_star_counts_and_normalize(tmp_path, rng):
    genes = [f"ENSG{i:011d}.{i % 3 + 1}" for i in range(30)]
    for uid in ("u1", "u2", "u3"):
        d = tmp_path / uid
        d.mkdir()
        df = pd.DataFrame({
            "gene_id": ["N_unmapped"] + genes,
            "unstranded": rng.integers(0, 5000, size=31),
            "tpm_unstranded": rng.uniform(0, 100, size=31),
        })
        df.to_csv(d / "counts.tsv", sep="\t", index=False)
    s = read_star_counts_tsv(tmp_path / "u1" / "counts.tsv")
    assert len(s) == 30
    assert not any("." in g for g in s.index)  # version suffix stripped

    from multimodal_survival_prediction_tpu.preprocess.genomic import (
        build_rnaseq_matrix,
    )

    mat = build_rnaseq_matrix(tmp_path)
    assert mat.shape == (3, 30)
    norm, selected = normalize_rnaseq(mat, top_k=10)
    assert norm.shape == (3, 10)
    assert len(selected) == 10
    # z-scored over full matrix before selection: each kept gene ~0 mean
    np.testing.assert_allclose(norm.mean(axis=0), 0, atol=1e-9)


def test_mutation_matrix(tmp_path):
    maf = pd.DataFrame({
        "Hugo_Symbol": ["TP53", "BRCA1", "TP53", "KRAS"],
        "Tumor_Sample_Barcode": [
            "TCGA-AA-0001-01A", "TCGA-AA-0001-01A",
            "TCGA-BB-0002-01A", "TCGA-BB-0002-01A"],
    })
    maf.to_csv(tmp_path / "m.maf", sep="\t", index=False)
    mat = mutation_matrix_from_maf(tmp_path / "m.maf")
    assert mat.loc["TCGA-AA-0001", "TP53"] == 1
    assert mat.loc["TCGA-AA-0001", "KRAS"] == 0
    assert set(mat.index) == {"TCGA-AA-0001", "TCGA-BB-0002"}
