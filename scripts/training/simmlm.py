#!/usr/bin/env python
"""SimMLM mixture-of-modality-experts with per-expert Cox heads, masked-softmax gating and MoFe auxiliary loss (model from reference scripts/analysis/generate_km_curves.py:160-281; training script absent - reconstructed per results/simmim/cv_results.json hyperparameters, mofe_lambda=0.1)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import SIMMLM

    run_training(args, SIMMLM)


if __name__ == "__main__":
    main()
