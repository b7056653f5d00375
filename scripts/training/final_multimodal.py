#!/usr/bin/env python
"""Complete multimodal late fusion (parity with reference scripts/training/final_multimodal.py: CT DenseNet121-3D + RNA 5005-512-128 + clinical 1-32, fusion 288-256-128, Adam lr=1e-4 wd=1e-4, ReduceLROnPlateau on val C-index, early stop patience 15, bs=4, 5-fold CV)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import FINAL_MULTIMODAL

    run_training(args, FINAL_MULTIMODAL)


if __name__ == "__main__":
    main()
