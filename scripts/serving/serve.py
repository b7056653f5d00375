#!/usr/bin/env python
"""Risk-scoring HTTP service over a trained checkpoint.

    python scripts/serving/serve.py --model partial_modality \
        --checkpoint models/partial_modality/fold_1_best.msgpack --port 8400

Endpoints:
  GET  /healthz          -> {"status": "ok", "model": ...}
  POST /score            -> body {"rnaseq": [5005 floats]?, "age": float?,
                                  "nifti_path": "..."?}
                            reply {"risk_score": ..., "modalities_used": ...}

The model is compiled once at startup (warmup) so request latency is one
device step + preprocessing.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="partial_modality")
    p.add_argument("--checkpoint", required=True, nargs="+",
                   help="fold checkpoint path(s); several = fold ensemble "
                        "(one vmapped program scores all folds per request)")
    p.add_argument("--backbone", default=None,
                   choices=["densenet121", "simple_cnn"],
                   help="default: the checkpoint's .meta.json, else densenet121")
    p.add_argument("--rna-dim", type=int, default=None,
                   help="default: the checkpoint's .meta.json, else 5005")
    p.add_argument("--batch-size", type=int, default=1,
                   help="compiled scoring batch: /score_batch micro-batches "
                        "requests into chunks of this size (one dispatch "
                        "per chunk); single /score requests are padded")
    p.add_argument("--calibration", default=None,
                   help="calibration.json from scripts/serving/calibrate.py "
                        "— per-fold (mu, sd) applied before ensemble "
                        "averaging (rank-stable, matches predict_risk)")
    p.add_argument("--warm-no-image", action="store_true",
                   help="also compile an image-less scoring program at "
                        "startup: image-less requests then skip shipping "
                        "the zero CT plane (a second multi-minute compile "
                        "on the remote tunnel)")
    p.add_argument("--image-shape", default=None,
                   help="default: the checkpoint's .meta.json, else 64,64,32")
    p.add_argument("--hu-window", default=None,
                   help="CT Hounsfield window 'lo,hi' — must match the value "
                        "the checkpoint was TRAINED with (use the = form for "
                        "negative bounds: --hu-window=-150,250)")
    p.add_argument("--aot-cache", default=None, metavar="DIR",
                   help="compiled-executable cache directory "
                        "(io/aot_cache.py): the first server process pays "
                        "the compile and persists the executable; later "
                        "processes with the same program load it and skip "
                        "tracing+lowering+XLA compile (minutes on the "
                        "remote tunnel). Per-machine cache; checkpoint "
                        "contents are runtime arguments and never "
                        "invalidate it")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    args = p.parse_args()

    from multimodal_survival_prediction_tpu.serving import RiskScorer
    from multimodal_survival_prediction_tpu.utils import parse_hu_window

    fold_calibration = None
    if args.calibration:
        import json

        cal = json.loads(Path(args.calibration).read_text())
        fold_calibration = [tuple(s) for s in cal["stats"]]

    scorer = RiskScorer(
        args.model,
        args.checkpoint[0] if len(args.checkpoint) == 1 else args.checkpoint,
        backbone=args.backbone,
        rna_dim=args.rna_dim,
        batch_size=args.batch_size,
        fold_calibration=fold_calibration,
        no_image_variant=args.warm_no_image,
        image_shape=(tuple(int(x) for x in args.image_shape.split(","))
                     if args.image_shape else None),
        hu_window=parse_hu_window(args.hu_window),
        aot_cache_dir=args.aot_cache)
    aot = ", ".join(f"{k}: {v['source']}" for k, v in scorer.aot_info.items())
    print(f"model {args.model} loaded + compiled"
          + (f" (aot-cache {aot})" if aot else "")
          + f"; serving on {args.host}:{args.port}")

    from multimodal_survival_prediction_tpu.serving import make_server

    make_server(scorer, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
