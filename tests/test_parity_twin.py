"""Twin-run parity tripwire: the torch oracle (benchmarks/torch_twin.py,
faithful to reference train_rnaseq_only.py:157-287) and the JAX CV driver
must land in the same C-index neighborhood on the same cohort with identical
splits. The committed PARITY_TWIN.md artifact carries the full-scale
evidence (50 epochs, 3 folds, multi-seed oracle); this test is a compact CI
guard against gross training-stack divergence (loss/optimizer/schedule/BN
regressions on either side)."""

import dataclasses

import numpy as np

from benchmarks.torch_twin import harrell_cindex_np, run_torch_rnaseq_cv
from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
from multimodal_survival_prediction_tpu.data.datasets import (
    build_cohort_arrays,
    load_rnaseq_matrix,
    select_cohort,
)
from multimodal_survival_prediction_tpu.data.matching_table import (
    load_matching_table,
)
from multimodal_survival_prediction_tpu.data.synthetic import (
    SyntheticCohortSpec,
    generate_synthetic_cohort,
)
from multimodal_survival_prediction_tpu.train.cv import run_cross_validation
import pytest


def test_harrell_oracle_agrees_with_ops_cindex(rng):
    """The twin's independent numpy Harrell matches ops/cindex.py."""
    from multimodal_survival_prediction_tpu.ops.cindex import (
        concordance_index_np,
    )

    h = rng.normal(size=40)
    t = rng.uniform(1, 100, size=40).round(0)  # rounded -> some time ties
    e = (rng.uniform(size=40) < 0.6).astype(float)
    # ops/cindex computes in float32 on device; the oracle in float64
    assert abs(harrell_cindex_np(h, t, e)
               - concordance_index_np(h, t, e)) < 1e-6


@pytest.mark.slow
def test_twin_cv_parity_compact(tmp_path):
    cohort_root = tmp_path / "cohort"
    generate_synthetic_cohort(
        cohort_root, SyntheticCohortSpec(n_patients=200, p_rnaseq=0.9))
    table = load_matching_table(
        cohort_root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = (cohort_root / "data" / "processed"
                  / "rnaseq_normalized_mapped.csv")

    cohort = select_cohort(table, "rnaseq_only")
    rnaseq_df = load_rnaseq_matrix(rnaseq_csv)
    cohort = cohort[cohort.patient_id.isin(set(rnaseq_df.index))]
    arrays = build_cohort_arrays(cohort, rnaseq_df, with_image=False)

    cfg = dataclasses.replace(RNASEQ_ONLY, n_folds=2)
    epochs = 8

    torch_folds = run_torch_rnaseq_cv(
        arrays.arrays["rnaseq"], arrays.arrays["time"],
        arrays.arrays["event"], n_folds=cfg.n_folds, num_epochs=epochs,
        batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay, seed=cfg.seed)
    _, jax_outcomes = run_cross_validation(
        cfg, table, rnaseq_csv=rnaseq_csv, num_epochs=epochs,
        write_outputs=False)

    t_mean = float(np.mean([f["best_c_index"] for f in torch_folds]))
    j_mean = float(np.mean([o.best_c_index for o in jax_outcomes]))
    # loose tripwire: CV C-index on ~100 patients at 8 epochs is noisy;
    # the committed PARITY_TWIN.md artifact carries the tight-band evidence
    assert abs(j_mean - t_mean) < 0.15, (t_mean, j_mean)
    assert 0.35 < t_mean <= 1.0 and 0.35 < j_mean <= 1.0
