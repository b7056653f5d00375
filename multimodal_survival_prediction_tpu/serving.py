"""Low-latency risk-scoring service layer.

The reference has no serving story (checkpoints are consumed by a documented
but unimplemented load_state_dict snippet, reference README.md:386-399).
This module provides one: a ``RiskScorer`` that loads a fold checkpoint once,
pre-compiles a fixed-batch scoring function, and scores single patients or
micro-batches with on-device CT preprocessing — suitable behind the bundled
HTTP endpoint (scripts/serving/serve.py) or any batch driver.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import ALL_CONFIGS, ModelRunConfig
from .io.checkpoint import load_checkpoint
from .ops.resample import resample_normalize_bucketed
from .train.adapters import make_model_and_adapters


class RiskScorer:
    """One loaded model, compiled once, scoring forever.

    Args:
      model_name: config key (e.g. 'partial_modality').
      checkpoint_path: models/<name>/fold_K_best.msgpack — or a SEQUENCE of
        fold checkpoint paths for a fold ensemble: fold params are stacked on
        a leading axis and the scoring program is vmapped over it, so one
        compiled dispatch scores every fold (TPU batches the fold axis
        through the same MXU matmuls).
      batch_size: compiled scoring batch (requests are padded to it).
      fold_calibration: optional per-fold (mu, sd) pairs from a calibration
        cohort (e.g. train.predict.predict_risk over the training set) —
        Cox log-hazards are only defined up to a per-model shift, so
        z-scoring each fold before averaging is the rank-stable ensemble
        combination (matches predict_risk's cohort-level z-score). Without
        it, the raw per-fold hazards are averaged (fold shifts are constant
        per checkpoint, so request ORDERING stays consistent).
      hu_window: CT Hounsfield window — must match training ingest.
      no_image_variant: also compile an image-less scoring program at
        warmup (zero image constant-folded on device): image-less requests
        then skip shipping the zero image plane, which dominates request
        bytes over a slow link (docs/SERVING.md latency table). Opt-in for
        image models because it is a second multi-minute compile on the
        remote tunnel; image-FREE families (e.g. rnaseq_only) always use
        the image-less program — it is their only one.
      aot_cache_dir: directory for the compiled-executable cache
        (io/aot_cache.py). The FIRST scorer process pays the XLA compile
        and persists the executable; every later process with the same
        program (model/batch/shapes — checkpoints are runtime arguments,
        so fold rotation does NOT invalidate it) skips the compile — on
        the remote-TPU tunnel that is minutes per program. A warm start
        still pays Python tracing + StableHLO lowering (the cache key is
        the lowered program), seconds of host work for the 121-layer
        model. `self.aot_info` records hit/miss per program.
    """

    def __init__(self, model_name: str, checkpoint_path,
                 backbone: str | None = None, batch_size: int = 1,
                 rna_dim: int | None = None, image_shape=None,
                 hu_window=None, fold_calibration=None,
                 no_image_variant: bool = False,
                 aot_cache_dir=None):
        from .io.checkpoint import load_fold_meta

        self.cfg: ModelRunConfig = ALL_CONFIGS[model_name]
        # materialize ONCE: checkpoint_path may be a generator (e.g. a
        # Path.glob), which a second list() would find exhausted
        paths = ([checkpoint_path]
                 if isinstance(checkpoint_path, (str, Path))
                 else list(checkpoint_path))
        if not paths:
            raise ValueError("checkpoint_path is empty")
        # training-time facts default from the checkpoint's .meta.json
        # (written by the CV drivers); explicit arguments win
        meta = load_fold_meta(paths[0]) or {}
        backbone = backbone or meta.get("backbone") or "densenet121"
        self.image_shape = tuple(
            image_shape if image_shape is not None
            else meta.get("image_shape") or (64, 64, 32))
        self.rna_dim = int(rna_dim if rna_dim is not None
                           else meta.get("rna_dim") or 5005)
        self.batch_size = batch_size
        # must match training ingest: a checkpoint trained with an HU window
        # scored on unwindowed CTs sees a shifted intensity distribution
        if hu_window is None and meta.get("hu_window"):
            hu_window = meta["hu_window"]
        self.hu_window = tuple(hu_window) if hu_window is not None else None

        model, self._batch_to_inputs, hazard_and_aux = \
            make_model_and_adapters(self.cfg, backbone=backbone)
        self._hazard_and_aux = hazard_and_aux or (lambda out, b: (out, 0.0))
        self.model = model

        example = self._empty_batch_host(batch_size)
        shapes = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)},
                *self._batch_to_inputs(example), train=False))
        target = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
        self.n_folds = len(paths)
        extra_keys = [k for k in shapes if k not in ("params", "batch_stats")]
        extras = {}
        if extra_keys:
            # Deterministic non-param collections (MMsurvNet 'constants'
            # count-sketch matrices, models/mmsurv.py:48-57) are not in the
            # checkpoint and must come from a REAL init — the zeros tree
            # would silently zero the CBP pathway for every /score request.
            real = jax.jit(lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)},
                *self._batch_to_inputs(example), train=False))()
            extras = {k: jax.tree_util.tree_map(np.asarray, real[k])
                      for k in extra_keys}
        per_fold = []
        for p in paths:
            restored = load_checkpoint(Path(p), {
                "params": target["params"],
                "batch_stats": target.get("batch_stats", {})})
            per_fold.append({"params": restored["params"],
                             "batch_stats": restored["batch_stats"],
                             **extras})

        if fold_calibration is not None:
            if len(fold_calibration) != self.n_folds:
                raise ValueError(
                    f"fold_calibration has {len(fold_calibration)} entries "
                    f"for {self.n_folds} checkpoints")
            self._cal_mu = np.asarray([m for m, _ in fold_calibration],
                                      np.float32)
            self._cal_sd = np.asarray([s for _, s in fold_calibration],
                                      np.float32) + 1e-8
        else:
            self._cal_mu = self._cal_sd = None

        def apply_one(variables, batch):
            out = model.apply(variables, *self._batch_to_inputs(batch),
                              train=False)
            hazard = self._hazard_and_aux(out, batch)[0]  # 2- or 3-tuple
            return hazard

        # Transfer-aware input layout: every non-image array is PACKED into
        # one (B, rna_dim + 8) host array and split inside the traced
        # program — ONE host->device transfer per request instead of seven.
        # On the axon tunnel the per-round-trip fixed cost dominates request
        # latency (docs/SERVING.md), so transfer COUNT matters as much as
        # bytes. Column layout must match _empty_packed/_fill_row.
        R = self.rna_dim

        def unpack(packed, image):
            return {
                "rnaseq": packed[:, :R],
                "clinical": packed[:, R:R + 1],
                "mask": packed[:, R + 1:R + 4],
                "time": packed[:, R + 4],
                "event": packed[:, R + 5],
                "svalid": packed[:, R + 6],
                "valid": packed[:, R + 7],
                "image": image,
            }

        def apply_full(variables, packed, image):
            return apply_one(variables, unpack(packed, image))

        def apply_no_image(variables, packed):
            # zero image materialized INSIDE the traced program: image-less
            # requests skip shipping the (B,D,H,W,1) zero plane — the bulk
            # of the request bytes — and its transfer round trip
            zero = jnp.zeros((self.batch_size, *self.image_shape, 1),
                             jnp.float32)
            return apply_one(variables, unpack(packed, zero))

        if self.n_folds == 1:
            self._variables = per_fold[0]
            self._score = jax.jit(apply_full)
            self._score_no_image = jax.jit(apply_no_image)
        else:
            # stack fold params on a leading axis; ONE vmapped program scores
            # all folds per dispatch (the fold axis rides the MXU batch dim)
            self._variables = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *per_fold)
            self._score = jax.jit(
                jax.vmap(apply_full, in_axes=(0, None, None)))
            self._score_no_image = jax.jit(
                jax.vmap(apply_no_image, in_axes=(0, None)))
        self._no_image_ready = False
        # image-free model families (e.g. rnaseq_only) never need the image
        # plane: compile ONLY the packed-only program — same compile count,
        # and no request ever ships the zero CT plane
        self._has_image_modality = "image" in self.cfg.modalities
        self.aot_cache_dir = aot_cache_dir
        self.aot_info: dict = {}
        self.warmup(no_image_variant=no_image_variant)

    def _aot(self, jitted, tag, *example_args):
        """Route one scoring program through the executable cache (when
        enabled); the compile path is byte-for-byte the jit the cache
        replaces, so a disabled/failed cache only costs time."""
        if not self.aot_cache_dir:
            return jitted
        if not hasattr(jitted, "lower"):
            # already swapped for a loaded/compiled executable by an earlier
            # warmup — keep warmup()/warmup_no_image() idempotent (a second
            # defensive call must not feed a Compiled back into lower())
            return jitted
        from .io.aot_cache import cached_compile

        compiled, info = cached_compile(
            jitted, *example_args, cache_dir=self.aot_cache_dir,
            extra_meta={"program": tag, "model": self.cfg.name,
                        "batch_size": self.batch_size,
                        "n_folds": self.n_folds})
        self.aot_info[tag] = info
        return compiled

    def _empty_batch_host(self, n):
        """Unpacked host zero batch — init/eval_shape example only; the
        request path ships the packed layout (_empty_packed)."""
        return {
            "rnaseq": np.zeros((n, self.rna_dim), np.float32),
            "clinical": np.zeros((n, 1), np.float32),
            "mask": np.zeros((n, 3), np.float32),
            "time": np.zeros((n,), np.float32),
            "event": np.zeros((n,), np.float32),
            "svalid": np.zeros((n,), np.float32),
            "valid": np.ones((n,), np.float32),
            "image": np.zeros((n, *self.image_shape, 1), np.float32),
        }

    def _empty_packed(self, n):
        """Packed host zeros (B, rna_dim + 8); the 'valid' column is 1."""
        packed = np.zeros((n, self.rna_dim + 8), np.float32)
        packed[:, self.rna_dim + 7] = 1.0  # valid
        return packed

    def _empty_image_host(self, n):
        return np.zeros((n, *self.image_shape, 1), np.float32)

    def warmup(self, no_image_variant: bool = False):
        from .utils.profiling import _sync

        if not self._has_image_modality:
            self.warmup_no_image()
            return
        # _sync (value readback), not block_until_ready: the latter returns
        # early on the axon remote backend, so the first request would still
        # pay the compile wait.
        packed = jnp.asarray(self._empty_packed(self.batch_size))
        image = jnp.asarray(self._empty_image_host(self.batch_size))
        self._score = self._aot(self._score, "score", self._variables,
                                packed, image)
        _sync(self._score(self._variables, packed, image))
        if no_image_variant:
            self.warmup_no_image()

    def warmup_no_image(self):
        """Compile the image-less scoring program (zero image constant
        on-device, so image-less requests skip shipping the zero plane).
        Opt-in: it is a SECOND compile — multi-minute on the remote tunnel —
        and score_many only routes to it once warmed (a cold program would
        stall an unlucky request instead)."""
        from .utils.profiling import _sync

        packed = jnp.asarray(self._empty_packed(self.batch_size))
        self._score_no_image = self._aot(
            self._score_no_image, "score_no_image", self._variables, packed)
        _sync(self._score_no_image(self._variables, packed))
        self._no_image_ready = True

    def _fill_row(self, packed, image, i, rnaseq=None, age=None, volume=None,
                  nifti_path=None):
        """Fill row `i` of the packed array (+ image plane); returns the
        modality mask. Column layout mirrors the traced `unpack`."""
        R = self.rna_dim
        mask = np.zeros(3, np.float32)
        if nifti_path is not None and volume is None:
            from .data.native import read_nifti_fast

            volume = read_nifti_fast(nifti_path).data
        if volume is not None:
            vol = np.asarray(
                resample_normalize_bucketed(np.asarray(volume),
                                            self.image_shape,
                                            hu_window=self.hu_window))
            image[i, ..., 0] = vol
            mask[0] = 1.0
        if rnaseq is not None:
            rna = np.asarray(rnaseq, np.float32)
            if rna.shape[-1] != self.rna_dim:
                raise ValueError(
                    f"expected {self.rna_dim} genes, got {rna.shape[-1]}")
            packed[i, :R] = rna
            mask[1] = 1.0
        if age is not None:
            packed[i, R] = float(age) / 100.0
            mask[2] = 1.0
        if not mask.any():
            raise ValueError("at least one modality is required")
        packed[i, R + 1:R + 4] = mask
        return mask

    def score(self, rnaseq=None, age=None, volume=None,
              nifti_path=None) -> dict:
        """Score one patient. Missing modalities are zero-filled with the
        matching mask bit cleared (the framework's standard missingness
        semantics). `volume` is a raw (D,H,W) array; `nifti_path` loads one."""
        return self.score_many([dict(rnaseq=rnaseq, age=age, volume=volume,
                                     nifti_path=nifti_path)])[0]

    def score_many(self, patients) -> list[dict]:
        """Score a sequence of patient dicts (keys: rnaseq/age/volume/
        nifti_path) — requests fill the compiled batch instead of costing one
        dispatch each, so micro-batched serving rides the same MXU batching
        the trainer uses. Chunks of `batch_size`; one dispatch per chunk."""
        results: list[dict] = []
        for start in range(0, len(patients), self.batch_size):
            chunk = patients[start:start + self.batch_size]
            wants_image = any(p.get("volume") is not None
                              or p.get("nifti_path") is not None
                              for p in chunk)
            if wants_image and not self._has_image_modality:
                raise ValueError(
                    f"model '{self.cfg.name}' has no image modality")
            # image-less chunks route to the warmed no-image program and skip
            # shipping the zero image plane (the bulk of the request bytes)
            use_noimg = not wants_image and self._no_image_ready
            packed = self._empty_packed(self.batch_size)
            image = (None if use_noimg
                     else self._empty_image_host(self.batch_size))
            masks = [self._fill_row(packed, image, i, **p)
                     for i, p in enumerate(chunk)]
            if use_noimg:
                hazard = self._score_no_image(self._variables,
                                              jnp.asarray(packed))
            else:
                hazard = self._score(self._variables, jnp.asarray(packed),
                                     jnp.asarray(image))
            h = np.asarray(hazard)
            # (F, B) per-fold hazards; calibration (when supplied) applies to
            # a single checkpoint too — a caller who passed (mu, sd) must get
            # z-scored output, not a silently raw hazard
            per_fold = h[None] if self.n_folds == 1 else h
            if self._cal_mu is not None:
                per_fold = ((per_fold - self._cal_mu[:, None])
                            / self._cal_sd[:, None])
            risks = per_fold.mean(axis=0)
            for i, mask in enumerate(masks):
                result = {
                    "risk_score": float(risks[i]),
                    "modalities_used": {
                        "image": bool(mask[0]), "rnaseq": bool(mask[1]),
                        "clinical": bool(mask[2]),
                    },
                    "model": self.cfg.display_name,
                }
                if self.n_folds > 1:
                    result["ensemble_folds"] = self.n_folds
                results.append(result)
        return results


def make_server(scorer: RiskScorer, host: str = "127.0.0.1", port: int = 0):
    """Build the HTTP risk-scoring server around a compiled RiskScorer.

    Endpoints (scripts/serving/serve.py is a thin CLI over this; living in
    the library keeps the HTTP contract under test):
      GET  /healthz      -> {"status": "ok", "model": ...}
      POST /score        -> body {"rnaseq": [...]?, "age": float?,
                                  "nifti_path": "..."?} -> scorer.score(...)
      POST /score_batch  -> body {"patients": [<score bodies>...]} ->
                            {"results": scorer.score_many(...)}

    Returns a ThreadingHTTPServer (port 0 = OS-assigned, read
    `server.server_address`); call serve_forever() / shutdown() yourself.
    """
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "model": scorer.cfg.display_name})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/score", "/score_batch"):
                self._reply(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                # well-formed JSON of the wrong SHAPE is a client error
                # (400), not a server fault (500)
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                if self.path == "/score_batch":
                    patients = req.get("patients", [])
                    if not isinstance(patients, list) or not all(
                            isinstance(p, dict) for p in patients):
                        raise ValueError(
                            "'patients' must be a list of objects")
                    results = scorer.score_many([
                        dict(rnaseq=p.get("rnaseq"), age=p.get("age"),
                             nifti_path=p.get("nifti_path"))
                        for p in patients])
                    self._reply(200, {"results": results})
                    return
                result = scorer.score(
                    rnaseq=req.get("rnaseq"),
                    age=req.get("age"),
                    nifti_path=req.get("nifti_path"),
                )
                self._reply(200, result)
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - operational guard
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):
            print(f"[serve] {fmt % a}")

    return ThreadingHTTPServer((host, port), Handler)
