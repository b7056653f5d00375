#!/usr/bin/env python
"""Simple late fusion RNA+Image (parity with reference scripts/training/simple_fusion.py: deep RNA encoder 5005-1024-512-256 + DenseNet121-3D image encoder, fusion head, bs=8, AdamW, 3-fold CV over has_imaging & has_rnaseq & has_survival patients)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import SIMPLE_FUSION

    run_training(args, SIMPLE_FUSION)


if __name__ == "__main__":
    main()
