"""Preprocessing: genomic normalization, DICOM decoding, UUID mapping."""

from .genomic import (  # noqa: F401
    build_rnaseq_matrix,
    normalize_rnaseq,
    mutation_matrix_from_maf,
)
