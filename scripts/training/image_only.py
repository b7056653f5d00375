#!/usr/bin/env python
"""Image-only small 3D CNN (model from reference scripts/analysis/generate_km_curves.py:28-54; training script absent from the reference - reconstructed per results/image_only/cv_results.json: 5 folds, legacy results schema)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import IMAGE_ONLY

    run_training(args, IMAGE_ONLY)


if __name__ == "__main__":
    main()
