"""Jitted, device-resident training engine.

The reference trains with a Python per-batch loop that re-reads every NIfTI
from disk each epoch (reference partial_modality_training.py:382-435,
num_workers=0 at :531-532). Here the whole cohort lives in HBM as fixed-shape
arrays and an entire epoch is ONE jitted ``lax.scan`` over shuffled batch
indices — no host round-trips inside an epoch, MXU stays hot.

Semantics preserved from the reference training loops (SURVEY §2.6):
  * Cox loss on the survival-labeled subset of each batch (masked, not
    Python-skipped; reference skips batches with <2 labeled or 0 events —
    our masked loss returns exactly 0 for those, so no parameter update
    happens either way modulo optimizer-moment decay, documented difference),
  * ragged final batch: the reference feeds a smaller last batch
    (no drop_last); we keep shapes static and pad the tail by cycling the
    epoch's own shuffled permutation. Loss terms for padded rows are masked
    to exactly 0, but BatchNorm batch statistics DO see the duplicated rows
    — a documented deviation (cycling spreads the duplicates across the
    cohort instead of biasing stats toward one row),
  * gradient clipping by global norm 1.0 (where the reference uses it),
  * torch Adam (L2-into-grad) vs AdamW (decoupled) distinction,
  * per-epoch pooled validation C-index,
  * best-checkpoint-by-val-C-index + early stopping on the host.

Sharding: pass a `jax.sharding.Mesh`; params/optimizer are replicated and the
batch dimension of the per-epoch index arrays is sharded, which makes XLA
shard every encoder forward/backward over devices (batch DP) and all-gather
the tiny (B,) hazard vector for the global Cox risk set (SURVEY §2.9).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from ..ops.cindex import concordance_index
from ..ops.cox import cox_partial_likelihood


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    eval_batch_size: int = 64
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    optimizer: str = "adam"  # 'adam' (torch Adam + L2) or 'adamw' (decoupled)
    grad_clip: float | None = 1.0
    ties: str = "breslow"
    seed: int = 42


def _scaled_by_host_lr(tx: optax.GradientTransformation):
    """Wrap a transformation so a host-fed scalar LR multiplies the update —
    epoch-granular schedules (cosine / reduce-on-plateau) without retracing."""

    def init(params):
        return tx.init(params)

    def update(grads, state, params, lr):
        updates, state = tx.update(grads, state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig):
    """clip -> (adam | adamw) with unit LR; actual LR applied per step."""
    chain = []
    if cfg.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.optimizer == "adam":
        # torch Adam(weight_decay=wd): wd*param added to grad BEFORE moments.
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        chain.append(optax.scale(-1.0))
    elif cfg.optimizer == "adamw":
        # torch AdamW: decoupled decay, scaled by lr along with the update.
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.scale(-1.0))
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return _scaled_by_host_lr(optax.chain(*chain))


class Trainer:
    """Drives one model through epochs on device-resident data.

    Args:
      model: a flax linen module whose __call__ takes ``train=`` kwarg.
      batch_to_inputs: fn(batch_dict) -> tuple of positional model args.
      hazard_and_aux: fn(model_outputs, batch) -> (hazard (B,), aux_loss
          scalar) — model-family-specific adapter (e.g. adds 0.01 * gate
          entropy for PartialModalityNet). Defaults to identity hazard.
      cfg: TrainConfig.
      mesh: optional jax.sharding.Mesh for batch-DP execution.
    """

    def __init__(
        self,
        model,
        batch_to_inputs: Callable,
        hazard_and_aux: Callable | None = None,
        cfg: TrainConfig = TrainConfig(),
        mesh=None,
        batch_axis: str = "data",
        tensor_parallel: bool = False,
        sharded_risk_set: bool = False,
        aot_cache_dir=None,
    ):
        self.model = model
        self.cfg = cfg
        self.batch_to_inputs = batch_to_inputs
        self.hazard_and_aux = hazard_and_aux or (lambda out, batch: (out, 0.0))
        self.tx = make_optimizer(cfg)
        self.mesh = mesh
        self.batch_axis = batch_axis
        # sharded_risk_set: compute the TRAIN loss with the distributed Cox
        # prefix scan (ops.cox_distributed) — the batch axis stays sharded
        # through the risk-set logcumsumexp instead of GSPMD all-gathering
        # the (B,) hazards. Opt-in scaling path for whole-biobank risk sets;
        # numerically equivalent to the default (tests/test_cox_distributed)
        # and exercised by __graft_entry__.dryrun_multichip.
        if sharded_risk_set and mesh is None:
            raise ValueError("sharded_risk_set requires a mesh")
        self.sharded_risk_set = sharded_risk_set
        # tensor_parallel: shard wide Dense kernels over the mesh's 'model'
        # axis (Megatron column pattern); GSPMD propagates + inserts the
        # collectives. Requires a mesh with a 'model' axis of size > 1.
        self.tensor_parallel = tensor_parallel and mesh is not None and (
            dict(mesh.shape).get("model", 1) > 1)
        # aot_cache_dir: persist the compiled scan-epoch executables to disk
        # (io/aot_cache.py) so a LATER PROCESS with the same program + shapes
        # skips the XLA compile — on the remote-TPU tunnel each scan program
        # is a multi-minute compile that XLA's persistent cache does not
        # capture (tracing + lowering still run to derive the cache key:
        # seconds of host work). Per-machine cache; results are unchanged
        # (same executables XLA would produce; any cache failure falls back
        # to a normal compile).
        self.aot_cache_dir = aot_cache_dir
        self._extra_collections = {}
        self._train_epoch_fn = None
        self._train_step_fn = None
        self._eval_fn = None
        self._eval_step_fn = None
        self._cindex_fn = None

    # ---------------- init ----------------

    def init_state(self, example_batch, fold: int = 0,
                   seed: int | None = None) -> TrainState:
        # fold-varying init: the reference seeds the global torch RNG once,
        # so each fold's model starts from different draws — fold_in mirrors
        # that (identical init across folds would correlate fold scores).
        # `seed` overrides cfg.seed (per-candidate init in train/sweep.py).
        seed = self.cfg.seed if seed is None else seed
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), fold)
        inputs = self.batch_to_inputs(example_batch)
        variables = self.model.init(
            {"params": rng, "dropout": rng}, *inputs, train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict({}))
        self._extra_collections = {
            k: v for k, v in variables.items()
            if k not in ("params", "batch_stats")
        }
        if self.mesh is not None and self.tensor_parallel:
            from ..parallel.sharding import param_shardings, replicate

            p_shard = param_shardings(params, self.mesh, tensor_parallel=True)
            params = jax.device_put(params, p_shard)
            # jit the optimizer init on the sharded params: GSPMD propagates
            # the param shardings onto the Adam moments automatically.
            with self.mesh:
                opt_state = jax.jit(self.tx.init)(params)
            return TrainState(
                params=params,
                batch_stats=replicate(batch_stats, self.mesh),
                opt_state=opt_state,
                step=replicate(jnp.zeros((), jnp.int32), self.mesh),
            )

        opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from ..parallel.sharding import replicate

            state = replicate(state, self.mesh)
        return state

    # ---------------- loss ----------------

    def _loss_fn(self, params, batch_stats, batch, rng):
        inputs = self.batch_to_inputs(batch)
        variables = {"params": params, "batch_stats": batch_stats,
                     **self._extra_collections}
        out, mutated = self.model.apply(
            variables, *inputs, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        res = self.hazard_and_aux(out, batch)
        # adapter may return (hazard, aux) or (hazard, aux, main_scale) —
        # main_scale=0 turns off the primary Cox term (SimMLM stage 1 trains
        # the experts alone)
        hazard, aux = res[0], res[1]
        main_scale = res[2] if len(res) > 2 else 1.0
        if self.sharded_risk_set:
            from ..ops.cox_distributed import cox_partial_likelihood_sharded

            cox = cox_partial_likelihood_sharded(
                hazard, batch["time"], batch["event"], mesh=self.mesh,
                axis_name=self.batch_axis, valid=batch["svalid"],
                presorted=False, ties=self.cfg.ties)
        else:
            cox = cox_partial_likelihood(
                hazard, batch["time"], batch["event"], valid=batch["svalid"],
                ties=self.cfg.ties)
        loss = main_scale * cox + aux
        return loss, mutated.get("batch_stats", batch_stats)

    # ---------------- compiled epoch fns ----------------

    def _gather_batch(self, data, idx, bvalid):
        batch = {k: v[idx] for k, v in data.items()}
        batch["valid"] = bvalid
        batch["svalid"] = batch["svalid"] * bvalid
        return batch

    def _build_train_epoch(self):
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)

        def train_epoch(state, data, perm, bvalid, rng, lr):
            # perm: (steps, B) int32; bvalid: (steps, B) float32.
            def step(carry, xs):
                st, key = carry
                idx, bv = xs
                batch = self._gather_batch(data, idx, bv)
                key, dkey = jax.random.split(key)
                (loss, new_bs), grads = grad_fn(
                    st.params, st.batch_stats, batch, dkey)
                updates, new_opt = self.tx.update(
                    grads, st.opt_state, st.params, lr)
                new_params = optax.apply_updates(st.params, updates)
                st = TrainState(params=new_params, batch_stats=new_bs,
                                opt_state=new_opt, step=st.step + 1)
                return (st, key), loss

            (state, _), losses = jax.lax.scan(step, (state, rng), (perm, bvalid))
            return state, jnp.mean(losses)

        return jax.jit(train_epoch, donate_argnums=(0,))

    def _build_train_step(self):
        """Single-step jitted update for the STREAMING path (per-step
        dispatch; the scan epoch is the default). Carries the dropout key
        exactly like the scan body (split per step), so given identical
        batch order the two paths produce the same trajectory."""
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)

        def train_step(st, batch, lr, key):
            key, dkey = jax.random.split(key)
            (loss, new_bs), grads = grad_fn(
                st.params, st.batch_stats, batch, dkey)
            updates, new_opt = self.tx.update(grads, st.opt_state, st.params,
                                              lr)
            new_params = optax.apply_updates(st.params, updates)
            st = TrainState(params=new_params, batch_stats=new_bs,
                            opt_state=new_opt, step=st.step + 1)
            return st, key, loss

        return jax.jit(train_step, donate_argnums=(0,))

    def eval_scan(self, params, batch_stats, data, idx, bvalid):
        """Traceable pooled-eval body: scan the eval batches, pool hazards,
        compute the whole-epoch C-index (reference final_multimodal.py:268-305).

        The single source of truth for eval semantics — jitted directly by
        `_build_eval` and vmapped over folds/candidates by
        cv_parallel._build_parallel_eval. Returns (cindex, per-step losses,
        pooled hazards)."""
        variables = {"params": params, "batch_stats": batch_stats,
                     **self._extra_collections}

        def body(_, xs):
            bidx, bv = xs
            batch = self._gather_batch(data, bidx, bv)
            out = self.model.apply(
                variables, *self.batch_to_inputs(batch), train=False)
            # adapter may return (hazard, aux) or (hazard, aux, main_scale)
            # (the contract _loss_fn documents) — index, don't unpack
            hazard = self.hazard_and_aux(out, batch)[0]
            loss = cox_partial_likelihood(
                hazard, batch["time"], batch["event"],
                valid=batch["svalid"], ties=self.cfg.ties)
            return None, (hazard, batch["time"], batch["event"],
                          batch["svalid"], loss)

        _, (h, t, e, sv, losses) = jax.lax.scan(body, None, (idx, bvalid))
        h, t, e, sv = (x.reshape(-1) for x in (h, t, e, sv))
        cindex = concordance_index(h, t, e, valid=sv)
        return cindex, losses, h

    def _build_eval_step(self):
        """Single-batch jitted eval for the STREAMING path (fixed
        eval_batch_size shape -> one compile; pooling happens on host)."""

        def eval_step(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats,
                         **self._extra_collections}
            out = self.model.apply(
                variables, *self.batch_to_inputs(batch), train=False)
            hazard = self.hazard_and_aux(out, batch)[0]  # 2- or 3-tuple
            loss = cox_partial_likelihood(
                hazard, batch["time"], batch["event"],
                valid=batch["svalid"], ties=self.cfg.ties)
            return hazard, loss

        return jax.jit(eval_step)

    def _build_eval(self):
        def eval_batches(params, batch_stats, data, idx, bvalid):
            cindex, losses, h = self.eval_scan(
                params, batch_stats, data, idx, bvalid)
            return cindex, jnp.mean(losses), h

        return jax.jit(eval_batches)

    def _maybe_aot(self, jitted, tag):
        """Wrap a lazily-built jit program in the disk-backed executable
        cache when ``aot_cache_dir`` is set (io/aot_cache.py); otherwise
        return it untouched. The wrapper dispatches per call-shape
        signature, so differing fold sizes simply become separate cached
        specializations — exactly jit's own behavior, persisted."""
        if not self.aot_cache_dir:
            return jitted
        from ..io.aot_cache import AOTCachedFunction

        return AOTCachedFunction(
            jitted, self.aot_cache_dir, tag=tag,
            extra_meta={"model": type(self.model).__name__,
                        "batch_size": self.cfg.batch_size})

    # ---------------- host-side API ----------------

    @staticmethod
    def _pad_indices(indices, batch_size: int,
                     rng: np.random.Generator | None):
        """Pad a fold's global row indices to (steps, batch) + validity mask.

        Fixed shapes keep the epoch jit-stable; the padded tail stands in for
        the reference DataLoader's ragged final batch (no drop_last). Padded
        rows cycle the epoch's own permutation (not a constant row) so the
        duplicates feeding BatchNorm statistics are spread across the cohort;
        their loss contribution is masked to 0 via ``bvalid`` (see module
        docstring for the BN deviation)."""
        indices = np.asarray(indices, np.int32)
        order = rng.permutation(indices) if rng is not None else indices
        n = len(indices)
        steps = max(1, -(-n // batch_size))
        padded = steps * batch_size
        idx = np.empty(padded, np.int32)
        idx[:n] = order
        if padded > n:
            idx[n:] = np.resize(order, padded - n)
        bvalid = np.zeros(padded, np.float32)
        bvalid[:n] = 1.0
        return (idx.reshape(steps, batch_size),
                bvalid.reshape(steps, batch_size))

    def _device_indices(self, idx, bvalid):
        idx, bvalid = jnp.asarray(idx), jnp.asarray(bvalid)
        if self.mesh is not None:
            from ..parallel.sharding import shard_batch_dim

            idx = shard_batch_dim(idx, self.mesh, self.batch_axis, axis=1)
            bvalid = shard_batch_dim(bvalid, self.mesh, self.batch_axis, axis=1)
        return idx, bvalid

    def train_epoch(self, state, data, indices,
                    shuffle_rng: np.random.Generator, lr: float, dropout_key):
        """One epoch over `indices` (global row ids into `data`)."""
        if self._train_epoch_fn is None:
            self._train_epoch_fn = self._maybe_aot(
                self._build_train_epoch(), "train_epoch")
        perm, bvalid = self._pad_indices(indices, self.cfg.batch_size,
                                         shuffle_rng)
        perm, bvalid = self._device_indices(perm, bvalid)
        state, loss = self._train_epoch_fn(state, data, perm, bvalid,
                                           dropout_key, jnp.float32(lr))
        return state, float(loss)

    def train_epoch_streaming(self, state, host_data, indices,
                              shuffle_rng: np.random.Generator, lr: float,
                              dropout_key, depth: int = 2):
        """Streaming-ingest epoch: the cohort stays on HOST (numpy arrays),
        batches are gathered there and double-buffered onto the device by
        ``data.pipeline.BatchPrefetcher`` while the previous step computes.

        Use when the cohort exceeds HBM (the default `train_epoch` keeps all
        arrays device-resident and scans — always prefer it when data fits).
        Same semantics as the scan path: identical batch order + per-step
        dropout-key chain → same trajectory."""
        from ..data.pipeline import BatchPrefetcher

        if self._train_step_fn is None:
            self._train_step_fn = self._maybe_aot(
                self._build_train_step(), "train_step")
        perm, bvalid = self._pad_indices(indices, self.cfg.batch_size,
                                         shuffle_rng)

        def host_batches():
            for idx, bv in zip(perm, bvalid):
                batch = {k: v[idx] for k, v in host_data.items()}
                batch["valid"] = bv
                batch["svalid"] = batch["svalid"] * bv
                yield batch

        sharding = self._batch_sharding()
        key = dropout_key
        losses = []
        lr_arr = jnp.float32(lr)
        for batch in BatchPrefetcher(host_batches(), depth=depth,
                                     sharding=sharding):
            state, key, loss = self._train_step_fn(state, batch, lr_arr, key)
            losses.append(loss)
        # ONE readback for the whole epoch: fetching each scalar would pay
        # the per-readback dispatch cost every step (and serialize the
        # prefetch pipeline against the device)
        return state, float(jnp.mean(jnp.stack(losses)))

    def _batch_sharding(self):
        if self.mesh is None:
            return None
        from ..parallel.sharding import batch_sharding

        return batch_sharding(self.mesh, self.batch_axis)

    def evaluate_streaming(self, state, host_data, indices, depth: int = 2):
        """Streaming twin of :meth:`evaluate`: the cohort stays on HOST,
        eval batches are double-buffered onto the device, hazards pool on the
        host, and the pooled whole-epoch C-index (reference
        final_multimodal.py:268-305 semantics, same as ``eval_scan``) is
        computed by the same ``concordance_index`` op on a bucket-padded
        vector — one compile per 512-row bucket instead of one per fold
        size."""
        from ..data.pipeline import BatchPrefetcher

        if self._eval_step_fn is None:
            self._eval_step_fn = self._maybe_aot(
                self._build_eval_step(), "eval_step")
        idx, bvalid = self._pad_indices(indices, self.cfg.eval_batch_size,
                                        None)

        def host_batches():
            for bidx, bv in zip(idx, bvalid):
                batch = {k: v[bidx] for k, v in host_data.items()}
                batch["valid"] = bv
                batch["svalid"] = batch["svalid"] * bv
                yield batch

        hazards, losses = [], []
        for batch in BatchPrefetcher(host_batches(), depth=depth,
                                     sharding=self._batch_sharding()):
            h, loss = self._eval_step_fn(state.params, state.batch_stats,
                                         batch)
            hazards.append(h)
            losses.append(loss)
        # ONE readback drains the queue (in-order execution; see
        # train_epoch_streaming)
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        from ..parallel.multihost import read_back  # multihost-safe asarray

        h = np.concatenate([read_back(x) for x in hazards])

        flat_idx, bv = idx.reshape(-1), bvalid.reshape(-1)
        t = host_data["time"][flat_idx]
        e = host_data["event"][flat_idx]
        sv = host_data["svalid"][flat_idx] * bv
        bucket = max(512, -(-h.size // 512) * 512)
        pad = bucket - h.size
        if pad:
            z = np.zeros(pad, np.float32)
            h, t, e, sv = (np.concatenate([a.astype(np.float32), z])
                           for a in (h, t, e, sv))
        if self._cindex_fn is None:
            self._cindex_fn = jax.jit(concordance_index)
        cindex = float(self._cindex_fn(h, t, e, sv))
        return cindex, mean_loss, h[: len(indices)]

    def evaluate(self, state, data, indices):
        """Pooled C-index / mean loss / per-sample hazards over `indices`."""
        if self._eval_fn is None:
            self._eval_fn = self._maybe_aot(self._build_eval(), "eval_scan")
        idx, bvalid = self._pad_indices(indices, self.cfg.eval_batch_size,
                                        None)
        idx, bvalid = self._device_indices(idx, bvalid)
        cindex, loss, hazards = self._eval_fn(
            state.params, state.batch_stats, data, idx, bvalid)
        # multihost: pooled hazards come back sharded across processes;
        # read_back allgathers them (plain np.asarray elsewhere)
        from ..parallel.multihost import read_back

        return float(cindex), float(loss), read_back(hazards)[: len(indices)]
