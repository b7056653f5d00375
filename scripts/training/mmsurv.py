#!/usr/bin/env python
"""MMsurv Compact Bilinear Pooling + transformer fusion (no reference implementation exists - metadata-only model, results/mmsurv/cv_results.json: bs=8 lr=1e-3 wd=1e-4 dropout=0.5)."""

from common import base_parser, run_training


def main():
    args = base_parser(__doc__).parse_args()
    from multimodal_survival_prediction_tpu.config import MMSURV

    run_training(args, MMSURV)


if __name__ == "__main__":
    main()
