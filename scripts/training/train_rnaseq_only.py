#!/usr/bin/env python
"""RNA-seq-only survival training (parity with reference
scripts/training/train_rnaseq_only.py: MLP 5005->1024->512->256->1, AdamW
lr=1e-4 wd=1e-3, cosine schedule, bs=16, 3-fold CV, 50 epochs, cohort =
has_rnaseq & has_survival; writes results/rnaseq_only/cv_results.json)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY

    run_training(args, RNASEQ_ONLY)


if __name__ == "__main__":
    main()
