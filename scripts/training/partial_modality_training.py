#!/usr/bin/env python
"""Gated partial-modality training over ALL patients (parity with reference scripts/training/partial_modality_training.py: zero-masked modalities, gate network with entropy regularizer 0.01, unlabeled patients appended to every folds train set, bs=8)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import PARTIAL_MODALITY

    run_training(args, PARTIAL_MODALITY)


if __name__ == "__main__":
    main()
