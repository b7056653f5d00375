"""Data layer: NIfTI/DICOM I/O, matching-table contract, synthetic cohorts,
array dataset builders, and the host->device input pipeline."""

from .nifti import read_nifti, write_nifti, NiftiImage  # noqa: F401
from .matching_table import (  # noqa: F401
    MATCHING_COLUMNS,
    build_full_matching_table,
    load_matching_table,
)
from .synthetic import generate_synthetic_cohort  # noqa: F401
