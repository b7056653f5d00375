"""AOT compiled-executable cache: compile once, load in any later process.

Why this exists: a serving or analysis process pays Python tracing +
lowering + XLA compilation for every program it jits, and on this
environment's remote-TPU tunnel a single train/score program costs 3-5
minutes to compile and is NOT captured by XLA's persistent compilation
cache (CLAUDE.md).  `jax.experimental.serialize_executable` pickles the
COMPILED PJRT executable; reloading it skips the XLA compile, so a fleet
of scoring processes can share one paid compile.  (A warm process still
pays Python tracing + StableHLO lowering — :func:`cached_compile` derives
the cache key from the lowered program — which is seconds of host work,
vs minutes for the remote compile it skips.)  The torch reference has no
ahead-of-time story at all (eager
per-call dispatch, reference README.md:386-399 load-and-eval snippet);
this is a capability the TPU rebuild adds.

Safety model:
  * Entries are keyed by a fingerprint of the lowered StableHLO text plus
    jax/jaxlib versions, backend platform, device kind, and device count —
    a cache hit can never hand a different program, version, or topology
    a stale executable.
  * Executables are machine-specific (XLA:CPU bakes host ISA features;
    TPU executables bake the chip generation): treat the cache directory
    as per-machine, like a ccache dir.
  * ANY failure to load (missing, corrupt, version drift, backend refuses
    deserialization) silently falls back to a fresh compile and rewrites
    the entry; the cache can only save time, never change results — the
    executable bytes are produced by the same XLA compile it replaces.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import pickle
import tempfile
import time
from pathlib import Path

import jax

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1


def _jaxlib_version() -> str:
    try:
        import jaxlib.version
        return jaxlib.version.__version__
    except Exception:
        return jax.__version__


def _env_fingerprint() -> dict:
    """Everything besides the program itself that an executable bakes in."""
    dev = jax.devices()[0]
    return {
        "format": _FORMAT_VERSION,
        "jax": jax.__version__,
        "jaxlib": _jaxlib_version(),
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "n_devices": jax.device_count(),
    }


def program_key(lowered, extra=()) -> str:
    """Cache key for a `jax.stages.Lowered` program.

    sha256 of the lowered StableHLO text + environment fingerprint +
    caller-supplied `extra` parts (e.g. a checkpoint path or batch size,
    for humans debugging collisions — the HLO text already pins shapes).
    """
    h = hashlib.sha256()
    h.update(lowered.as_text().encode())
    h.update(json.dumps(_env_fingerprint(), sort_keys=True).encode())
    for part in extra:
        h.update(str(part).encode())
    return h.hexdigest()[:32]


def _entry_paths(cache_dir, key):
    cache_dir = Path(cache_dir)
    return cache_dir / f"{key}.jaxexe", cache_dir / f"{key}.meta.json"


def save_executable(compiled, cache_dir, key, extra_meta=None) -> Path:
    """Serialize a `jax.stages.Compiled` into the cache (atomic write)."""
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    # deserialize_and_load defaults execution_devices to ALL client devices,
    # which mis-loads a 1-device program onto an 8-device virtual mesh
    # ("expected 8 shards"); record the executable's own device list (order
    # matters for mesh programs) and re-pin it at load.
    device_ids = [d.id
                  for d in compiled.runtime_executable().local_devices()]
    blob = pickle.dumps({
        "payload": payload,
        "in_tree": in_tree,
        "out_tree": out_tree,
        "device_ids": device_ids,
        "env": _env_fingerprint(),
    })
    exe_path, meta_path = _entry_paths(cache_dir, key)
    exe_path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(exe_path.parent),
                               prefix=exe_path.name, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, exe_path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    meta = {"key": key, "bytes": len(blob), "created": time.time(),
            **_env_fingerprint(), **(extra_meta or {})}
    meta_path.write_text(json.dumps(meta, indent=2))
    return exe_path


def load_executable(cache_dir, key):
    """Load a cached executable, or None on any mismatch/failure.

    The returned object is callable with the ORIGINAL (pytree) argument
    structure the program was lowered with, exactly like the
    `jax.stages.Compiled` it replaces.
    """
    from jax.experimental import serialize_executable as se

    exe_path, _ = _entry_paths(cache_dir, key)
    if not exe_path.exists():
        return None
    try:
        blob = pickle.loads(exe_path.read_bytes())
        if blob["env"] != _env_fingerprint():
            logger.info("aot-cache %s: environment drift, recompiling", key)
            return None
        by_id = {d.id: d for d in jax.devices()}
        execution_devices = [by_id[i] for i in blob["device_ids"]]
        return se.deserialize_and_load(
            blob["payload"], blob["in_tree"], blob["out_tree"],
            execution_devices=execution_devices)
    except Exception as e:  # corrupt file, backend refusal, version drift
        logger.warning("aot-cache %s: load failed (%s: %s), recompiling",
                       key, type(e).__name__, e)
        return None


def _args_signature(args, kwargs=None):
    """Shape/dtype/treedef signature of a concrete call — the dispatch key
    for :class:`AOTCachedFunction` (mirrors what makes jit re-trace).
    Runs per call on hot paths (streaming per-step training), so it keys on
    the treedef OBJECT (hashable, cached by jax) rather than stringifying a
    multi-KB treedef repr for a ~2k-leaf TrainState every step."""
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs or {}))
    return (treedef,
            tuple((getattr(x, "shape", ()),
                   getattr(x, "dtype", None) or type(x).__name__)
                  for x in leaves))


class AOTCachedFunction:
    """Callable wrapper giving a jitted function a DISK-backed compile cache.

    Like jit's own in-memory specialization cache, keyed by the call's
    shape/dtype signature — but each specialization round-trips through
    :func:`cached_compile`, so a LATER PROCESS calling with the same
    shapes loads the persisted executable instead of recompiling (on the
    remote-TPU tunnel: milliseconds instead of minutes; XLA's persistent
    cache does not capture remote compiles there).  Used by
    ``train.engine.Trainer(aot_cache_dir=...)`` for its scan-epoch
    programs, whose padded fixed shapes make signatures stable across
    epochs (a new fold size is simply a second cached specialization).

    Results are untouched: every executable is produced by the same XLA
    compile the wrapper replaces, and any load/store failure falls back
    to that compile.  `info` maps each seen signature to its
    cache/compile provenance.  Note: the signature does not encode input
    SHARDINGS — use one instance per trainer/mesh (as the engine does),
    not across differently-sharded callers.
    """

    def __init__(self, jitted, cache_dir, tag="fn", extra_meta=None):
        self._jitted = jitted
        self._cache_dir = cache_dir
        self._tag = tag
        self._extra_meta = extra_meta
        self._by_sig = {}
        self.info = {}

    def __call__(self, *args):
        sig = _args_signature(args)
        fn = self._by_sig.get(sig)
        if fn is None:
            meta = {"program": self._tag, **(self._extra_meta or {})}
            fn, info = cached_compile(
                self._jitted, *args, cache_dir=self._cache_dir,
                extra_meta=meta)
            self._by_sig[sig] = fn
            self.info[sig] = info
        return fn(*args)


def cached_compile(jitted, *example_args, cache_dir, extra_key=(),
                   extra_meta=None, **example_kwargs):
    """Compile `jitted` for `example_args` through the executable cache.

    Returns `(callable, info)` where `callable` accepts the same argument
    structure as the jitted function at these example shapes/dtypes, and
    `info` is `{"source": "cache"|"compile", "key": ..., "path": ...}`.

    On a hit the compile is skipped entirely; on a miss the program is
    compiled normally and the executable persisted for the next process.
    Serialization failures never break the caller — the freshly compiled
    program is returned and the cache entry simply isn't written.
    """
    lowered = jitted.lower(*example_args, **example_kwargs)
    key = program_key(lowered, extra=extra_key)
    exe_path, _ = _entry_paths(cache_dir, key)
    loaded = load_executable(cache_dir, key)
    if loaded is not None:
        logger.info("aot-cache hit %s (%s)", key, exe_path)
        return loaded, {"source": "cache", "key": key, "path": str(exe_path)}
    compiled = lowered.compile()
    try:
        save_executable(compiled, cache_dir, key, extra_meta=extra_meta)
        logger.info("aot-cache store %s (%s)", key, exe_path)
    except Exception as e:  # unsupported backend, unpicklable trees, ENOSPC
        logger.warning("aot-cache %s: store failed (%s: %s); executable "
                       "not persisted", key, type(e).__name__, e)
    return compiled, {"source": "compile", "key": key, "path": str(exe_path)}
