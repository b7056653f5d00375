#!/usr/bin/env python
"""Flexible multimodal with learnable missing-modality bias vectors (parity with reference scripts/training/flexible_multimodal.py: feature = feat*mask + bias*(1-mask), bs=16, 3-fold CV over all survival-labeled patients)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import FLEXIBLE_MULTIMODAL

    run_training(args, FLEXIBLE_MULTIMODAL)


if __name__ == "__main__":
    main()
