"""Host -> device input pipeline: overlapped decode/transfer/resample.

The reference's input pipeline is the pathological case this replaces:
`num_workers=0` DataLoaders re-reading and re-resampling every NIfTI from
disk on host for every batch of every epoch (reference
partial_modality_training.py:531-532, SURVEY §3.1 HOT LOOP #0).

Design here:
  * preprocess-once: each volume is decoded on host once, shipped to device,
    and resampled/normalized there (ops.resample); the resulting
    (N, 64, 64, 32, 1) cache lives in HBM (~75 MB fp32 for the full imaging
    cohort) for all epochs/folds,
  * overlap: a thread pool decodes NIfTI bytes while the device resamples the
    previous volume — decode (host, gzip+memcpy bound) and resample (device)
    pipeline cleanly, so ingest runs at ~decode speed,
  * generality: for cohorts too big for HBM, `BatchPrefetcher` wraps any
    host batch iterator with an N-deep jax.device_put prefetch queue
    (double-buffered by default), the standard JAX input-feeding pattern —
    it feeds `train.engine.Trainer.train_epoch_streaming`, the streaming
    twin of the device-resident scan epoch (equivalence tested in
    tests/test_train_e2e.py).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

log = logging.getLogger(__name__)

_BW_CACHE: dict = {}
_BW_PENDING: dict = {}  # backend -> (done_event, result_dict, nbytes)


def probe_link_bandwidth(nbytes: int = 8 << 20,
                         timeout_sec: float = 15.0) -> float:
    """Measured host->device link bandwidth (bytes/sec), cached per backend.

    Uses an UNCOMPILED ``device_put`` + ``device_get`` round trip — no jit
    program, so no multi-minute remote compile on the axon tunnel. The round
    trip is two transfers; device_get is a true barrier (unlike
    block_until_ready on the axon backend, CLAUDE.md).

    Axon quirk (measured round 3): in a FRESH process a bare device_get
    stalls until the process's first COMPILED program executes (>120 s
    observed; instant — ~70-130 ms/MB round trip — once any jit program has
    run). The round trip therefore runs in a watchdog thread: if it hasn't
    completed within ``timeout_sec`` the probe returns a pessimistic bound
    (< 2*nbytes/timeout), which makes 'auto' resample correctly prefer the
    host path on exactly this class of link. The stalled thread is left to
    finish in the background (it unblocks at first program execution) and
    its real measurement repairs the cache on the next call."""
    backend = jax.default_backend()
    if backend in _BW_CACHE:
        return _BW_CACHE[backend]

    pending = _BW_PENDING.get(backend)
    if pending is not None:
        done, result, pn = pending
        if not done.is_set():
            return 2 * pn / timeout_sec  # still stalled: pessimistic bound
        del _BW_PENDING[backend]
        if "dt" in result:  # stall ended; timed round trip is accurate
            bw = 2 * pn / max(result["dt"], 1e-9)
            _BW_CACHE[backend] = bw
            log.info("link bandwidth probe (late): %.1f MB/s", bw / 1e6)
            return bw
        # probe thread errored — fall through and retry below

    buf = np.ones(nbytes, np.uint8)
    done = threading.Event()
    result: dict = {}

    def _roundtrip():
        try:
            jax.device_get(jax.device_put(buf))  # warm (this is what stalls)
            t0 = time.perf_counter()
            jax.device_get(jax.device_put(buf))
            result["dt"] = time.perf_counter() - t0
        except Exception as e:  # pragma: no cover - backend specific
            result["err"] = e
        finally:
            done.set()

    threading.Thread(target=_roundtrip, daemon=True,
                     name="msp-link-probe").start()
    if not done.wait(timeout_sec):
        _BW_PENDING[backend] = (done, result, nbytes)
        bw = 2 * nbytes / timeout_sec
        log.warning(
            "link bandwidth probe stalled >%.0f s (axon fresh-process "
            "quirk); assuming <%.1f MB/s until it completes",
            timeout_sec, bw / 1e6)
        return bw
    if "err" in result:
        raise result["err"]
    bw = 2 * nbytes / max(result["dt"], 1e-9)
    _BW_CACHE[backend] = bw
    log.info("link bandwidth probe: %.1f MB/s", bw / 1e6)
    return bw


class VolumePrefetcher:
    """Decode NIfTIs on a host thread pool, resample host- or device-side.

    run(jobs, out_shape) yields (job_id, resampled_volume_np) — order not
    guaranteed. Failures yield (job_id, None) after logging (the reference's
    failure->missing-modality semantics, SURVEY §2.3).

    ``resample`` picks where the fused minmax+trilinear runs:
      * 'device' — ship the raw volume, resample on the accelerator
        (ops/resample.py). Optimal on fast links (PCIe/ICI-attached).
      * 'host'   — resample in the GIL-free C++ kernel
        (data/native.resample_normalize_host) and ship only the ~512 KB
        result. Optimal when the link is the bottleneck (an 80 MB int16 CT
        over a ~20-140 MB/s tunnel costs seconds; the host resample costs
        tens of milliseconds).
      * 'auto' (default) — measure both once (link-bandwidth probe + one
        host resample of the first decoded volume) and pick per cohort.
    Both paths are golden-equal (tests/test_native_pipeline.py)."""

    def __init__(self, num_workers: int = 4, depth: int = 2,
                 resample: str = "auto"):
        self.num_workers = num_workers
        self.depth = max(1, depth)
        self.resample = resample
        self.last_mode: str | None = None  # introspection (bench/logs)

    def run(self, jobs, out_shape, use_pallas: bool = False,
            hu_window=None, resample: str | None = None):
        from ..ops.resample import (
            resample_normalize_bucketed,
            resample_normalize_pallas,
        )
        from .native import (
            native_available,
            read_nifti_fast,
            resample_normalize_host,
        )

        mode = resample or self.resample
        if mode == "auto" and use_pallas:
            # An explicit device-kernel request (e.g. pinned by a checkpoint's
            # .meta.json) must not be silently rerouted to the host kernel:
            # host and device outputs agree only to float tolerance, and
            # scoring-time preprocessing must match training-time.
            mode = "device"
        if mode == "host" and not native_available():
            # An explicit host pin (e.g. a checkpoint .meta.json recording
            # resample_mode='host') cannot be honored without the C++ kernel.
            # resample_normalize_host would silently fall back to the XLA op
            # PER VOLUME from worker threads (one un-bucketed compile per
            # distinct CT shape — minutes each over the axon tunnel), so
            # reroute to the bucketed device path instead and say so loudly:
            # host and device outputs agree to atol=2e-5
            # (tests/test_native_pipeline.py), so scores move within float
            # tolerance, not silently and not expensively.
            log.warning(
                "resample='host' requested but the native C++ kernel is "
                "unavailable (build with `make -C csrc`); using the bucketed "
                "device resample instead (outputs agree to ~2e-5)")
            mode = "device"
        out_shape = tuple(out_shape)

        def preprocess_volume(vol, shape, use_pallas):
            # bucketed = one XLA compile per shape bucket; pallas path is the
            # fused single-HBM-pass kernel (exact-shape, TPU only).
            # hu_window: optional CT Hounsfield clip BEFORE normalization —
            # a capability the reference README claims but its code lacks
            # (SURVEY §2.3 note); default off for parity.
            if use_pallas:
                return resample_normalize_pallas(vol, shape,
                                                 hu_window=hu_window)
            return resample_normalize_bucketed(vol, shape,
                                               hu_window=hu_window)

        def decode(job):
            i, path = job
            try:
                return i, read_nifti_fast(path).data
            except Exception as e:
                log.warning("decode failed for %s: %s", path, e)
                return i, None

        def decode_and_host_resample(job):
            i, vol = decode(job)
            if vol is None:
                return i, None
            try:
                return i, resample_normalize_host(vol, out_shape,
                                                  hu_window=hu_window)
            except Exception as e:
                log.warning("host resample failed for job %s: %s", i, e)
                return i, None

        jobs = list(jobs)
        first_result = None  # (job_id, resampled) decided during the probe
        if mode == "auto":
            if not native_available():
                mode = "device"  # no C++ kernel -> host path has no engine
            else:
                # decode the first volume inline, time ONE host resample on
                # it (pure C++, no compile), and compare against the time
                # the raw volume would take to cross the measured link
                head, rest = None, []
                for j, job in enumerate(jobs):
                    i, vol = decode(job)
                    if vol is not None:
                        head, rest = (i, vol), jobs[j + 1:]
                        break
                    yield i, None  # failed decodes before the probe volume
                if head is None:
                    self.last_mode = "device"
                    return
                jobs = rest
                i, vol = head
                try:
                    t0 = time.perf_counter()
                    host_out = resample_normalize_host(vol, out_shape,
                                                       hu_window=hu_window)
                    host_sec = time.perf_counter() - t0
                except Exception as e:
                    # The probe volume DECODED fine — only the host kernel
                    # failed on it, and the rest of the cohort is about to
                    # take the device path anyway. Resample it on the device
                    # too instead of dropping a usable modality.
                    log.warning(
                        "host resample failed for probe job %s: %s "
                        "(device path keeps the volume)", i, e)
                    mode = "device"
                    first_result = (i, np.asarray(preprocess_volume(
                        vol, out_shape, use_pallas=use_pallas)))
                else:
                    try:
                        bw = probe_link_bandwidth()
                    except Exception as e:
                        # A failed probe must not abort the cohort ingest
                        # (failure->missing-modality is the module contract
                        # for per-volume errors; for the probe, degrade to
                        # the round-2 default path instead).
                        log.warning("link bandwidth probe failed (%s); "
                                    "using device resample", e)
                        bw = None
                    if bw is None:
                        mode = "device"
                    else:
                        transfer_sec = vol.nbytes / bw
                        mode = "host" if host_sec < transfer_sec else "device"
                        log.info(
                            "resample auto-select: %s (host %.0f ms/vol vs "
                            "link transfer %.0f ms/vol at %.1f MB/s)", mode,
                            host_sec * 1e3, transfer_sec * 1e3, bw / 1e6)
                    if mode == "host":
                        first_result = (i, host_out)
                    else:
                        # re-resample the probe volume on DEVICE so the
                        # cohort is single-path: host and device outputs
                        # agree only to float tolerance (atol=2e-5 pinned in
                        # tests/test_native_pipeline.py), not bit-exactly
                        first_result = (i, np.asarray(preprocess_volume(
                            vol, out_shape, use_pallas=use_pallas)))
        self.last_mode = mode

        if first_result is not None:
            yield first_result

        with ThreadPoolExecutor(self.num_workers) as pool:
            if mode == "host":
                # resample inside the GIL-free decode workers; nothing
                # crosses to the device here at all
                for i, out in pool.map(decode_and_host_resample, jobs):
                    yield i, out
                return
            # device-side resample pipeline, depth-limited on BOTH sides:
            # at most `depth` resamples in flight on the device, and at most
            # num_workers + depth decode futures outstanding on the host —
            # Executor.map would submit every job eagerly, and on a slow
            # link the decode workers outrun the consumer, buffering the
            # whole cohort's raw ~80 MB volumes in host RAM.
            job_iter = iter(jobs)
            futures: deque = deque()

            def _submit_more():
                while len(futures) < self.num_workers + self.depth:
                    job = next(job_iter, None)
                    if job is None:
                        break
                    futures.append(pool.submit(decode, job))

            _submit_more()
            inflight: list = []
            while futures:
                i, vol = futures.popleft().result()
                _submit_more()
                if vol is None:
                    yield i, None
                    continue
                out = preprocess_volume(vol, out_shape,
                                        use_pallas=use_pallas)
                inflight.append((i, out))
                if len(inflight) >= self.depth:
                    j, o = inflight.pop(0)
                    yield j, np.asarray(o)  # blocks until device done
            for j, o in inflight:
                yield j, np.asarray(o)


class BatchPrefetcher:
    """Wrap a host batch iterator with an N-deep device-transfer queue.

    A background thread pulls host batches, `jax.device_put`s them (sharded
    if a sharding is given), and keeps `depth` batches in flight so the
    accelerator never waits on host->HBM DMA."""

    def __init__(self, iterator, depth: int = 2, sharding=None):
        self.iterator = iterator
        self.depth = depth
        self.sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: list = []
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for batch in self.iterator:
                if self.sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda a: jax.device_put(a, self.sharding), batch)
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                self._q.put(batch)
        except Exception as e:  # surfaced on next __next__
            self._err.append(e)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err:
                raise self._err[0]
            raise StopIteration
        return item
