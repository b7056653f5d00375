"""Array dataset builders: matching table + RNA CSV + NIfTIs -> device arrays.

Replaces the reference's four per-script Dataset classes (SURVEY §2.3) with
one preprocess-once builder. The reference re-reads and re-resamples every
NIfTI from disk on EVERY __getitem__ of every epoch (reference
partial_modality_training.py:83-158, SURVEY §3.1 HOT LOOP #0); here each
volume is decoded once, resampled/normalized on device (ops.resample), and
the whole cohort lives in HBM as fixed-shape arrays:

  image   (N, D, H, W, 1) float32   zeros when missing
  rnaseq  (N, 5005)       float32   zeros when missing
  clinical(N, 1)          float32   age/100 (reference
                                    partial_modality_training.py:128), 0 when missing
  mask    (N, 3)          float32   [has_image, has_rnaseq, has_clinical]
  time    (N,)            float32   survival_time (0 when NaN)
  event   (N,)            float32   survival_status
  svalid  (N,)            float32   has_survival (labels usable)

Failure semantics preserved: an unreadable/corrupt NIfTI degrades to a zero
volume with mask=0 (the reference's silent `except: pass`, reference
simple_fusion.py:130-131) — but logged here instead of swallowed.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

log = logging.getLogger(__name__)


@dataclass
class CohortArrays:
    patient_ids: list
    arrays: dict  # str -> np.ndarray, all leading dim N
    # where the CT resample actually ran ('host'/'device'; None = no imaging):
    # recorded into fold .meta.json so scoring-time ingest can be pinned to
    # the training-time path (host vs device agree only to ~2e-5)
    ingest_mode: str | None = None
    index: dict = field(init=False)

    def __post_init__(self):
        self.index = {p: i for i, p in enumerate(self.patient_ids)}

    @property
    def n(self) -> int:
        return len(self.patient_ids)

    def rows(self, patient_ids) -> np.ndarray:
        return np.asarray([self.index[p] for p in patient_ids], np.int32)

    def to_device(self, mesh=None, image_dtype=None):
        import jax.numpy as jnp

        out = {}
        for k, v in self.arrays.items():
            arr = jnp.asarray(v)
            if k == "image" and image_dtype is not None:
                arr = arr.astype(image_dtype)
            out[k] = arr
        if mesh is not None:
            from ..parallel.sharding import replicate

            out = replicate(out, mesh)
        return out


def select_cohort(table: pd.DataFrame, model_name: str) -> pd.DataFrame:
    """Per-model cohort rules, matching each reference script's filter:

      rnaseq_only:     has_rnaseq & has_survival   (train_rnaseq_only.py:220-224)
      simple_fusion:   has_imaging & has_rnaseq & has_survival
                       (simple_fusion.py:344-348)
      flexible/simmim/mmsurv: has_survival          (flexible_multimodal.py:362)
      final:           has_imaging & survival_time notna
                       (final_multimodal.py:206-209, on the 109-cohort table)
      partial_modality: ALL patients (608); labels handled via svalid
                       (partial_modality_training.py:344-352)
      image_only:      has_imaging & has_survival
    """
    if model_name == "rnaseq_only":
        return table[table.has_rnaseq & table.has_survival]
    if model_name == "simple_fusion":
        return table[table.has_imaging & table.has_rnaseq & table.has_survival]
    if model_name in ("flexible_multimodal", "simmim", "mmsurv"):
        return table[table.has_survival]
    if model_name == "final":
        return table[table.has_imaging & table.survival_time.notna()]
    if model_name == "partial_modality":
        return table
    if model_name == "image_only":
        return table[table.has_imaging & table.has_survival]
    raise ValueError(f"unknown model {model_name!r}")


def load_rnaseq_matrix(rnaseq_csv) -> pd.DataFrame:
    df = pd.read_csv(rnaseq_csv, index_col=0)
    # drop duplicate patients, keep first (reference
    # map_rnaseq_via_gdc_api.py:104-108)
    return df[~df.index.duplicated(keep="first")]


def build_cohort_arrays(
    table: pd.DataFrame,
    rnaseq_df: pd.DataFrame | None,
    with_image: bool,
    image_shape=(64, 64, 32),
    use_pallas: bool = False,
    prefetcher=None,
    hu_window=None,
    resample: str | None = None,
) -> CohortArrays:
    """Build the fixed-shape array set for one cohort.

    `prefetcher`: optional pipeline.VolumePrefetcher for overlapped host
    decode -> device resample of the NIfTI volumes.
    """
    pids = list(table.patient_id)
    n = len(pids)
    rna_dim = rnaseq_df.shape[1] if rnaseq_df is not None else 0

    arrays = {
        "rnaseq": np.zeros((n, rna_dim), np.float32),
        "clinical": np.zeros((n, 1), np.float32),
        "mask": np.zeros((n, 3), np.float32),
        "time": np.zeros((n,), np.float32),
        "event": np.zeros((n,), np.float32),
        "svalid": np.zeros((n,), np.float32),
    }
    if with_image:
        arrays["image"] = np.zeros((n, *image_shape, 1), np.float32)

    rna_index = set(rnaseq_df.index) if rnaseq_df is not None else set()

    for i, (_, row) in enumerate(table.iterrows()):
        pid = row.patient_id
        if rnaseq_df is not None and pid in rna_index:
            arrays["rnaseq"][i] = rnaseq_df.loc[pid].to_numpy(np.float32)
            arrays["mask"][i, 1] = 1.0
        age = row.age
        if not pd.isna(age):
            arrays["clinical"][i, 0] = float(age) / 100.0
            arrays["mask"][i, 2] = 1.0
        t = row.survival_time
        arrays["time"][i] = 0.0 if pd.isna(t) else float(t)
        # NaN-guard like `time`: the loss masks invalid rows by MULTIPLYING
        # event by svalid (ops/cox.py), and 0 * NaN is NaN — one unlabeled
        # row with a NaN status in a user-supplied table would poison every
        # batch containing it. A LABELED row (has_survival) with NaN status
        # is contradictory upstream data, not a maskable gap — zero-filling
        # it would silently train the row as censored, so fail loudly.
        ev = row.survival_status
        if pd.isna(ev) and bool(row.has_survival):
            raise ValueError(
                f"patient {pid}: has_survival is set but survival_status "
                "is NaN — fix the matching table (a labeled row cannot "
                "have an undefined event status)")
        arrays["event"][i] = 0.0 if pd.isna(ev) else float(ev)
        arrays["svalid"][i] = float(bool(row.has_survival))

    ingest_mode = None
    if with_image:
        ingest_mode = _fill_images(arrays, table, image_shape, use_pallas,
                                   prefetcher, hu_window=hu_window,
                                   resample=resample)

    return CohortArrays(patient_ids=pids, arrays=arrays,
                        ingest_mode=ingest_mode)


def _fill_images(arrays, table, image_shape, use_pallas, prefetcher,
                 hu_window=None, resample: str | None = None):
    """Default ingest path: GIL-free C++ NIfTI decode on a thread pool,
    overlapped with shape-BUCKETED on-device resample+normalize (one XLA
    compile per shape bucket instead of one per distinct CT shape)."""
    if prefetcher is None:
        from .pipeline import VolumePrefetcher

        prefetcher = VolumePrefetcher()
    jobs = [
        (i, row.nifti_path)
        for i, (_, row) in enumerate(table.iterrows())
        if bool(row.has_imaging) and row.nifti_path
    ]
    for i, vol in prefetcher.run(jobs, image_shape, use_pallas,
                                 hu_window=hu_window, resample=resample):
        if vol is not None:
            arrays["image"][i, ..., 0] = vol
            arrays["mask"][i, 0] = 1.0
    return prefetcher.last_mode
