"""Multi-host execution tests (parallel/multihost.py).

The e2e test runs a REAL 2-process `jax.distributed` cluster on this
machine — two training-CLI subprocesses, 4 virtual CPU devices each, joined
through the JAX coordination service into one 8-device global mesh — and
checks the cross-process run reproduces the single-process 8-device result.
The reference has no distributed execution at all (SURVEY §2.9); this is
framework-original capability, so the oracle is the framework's own
single-process mesh path (tests/test_train_e2e.py::test_rnaseq_only_on_mesh
lineage).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess 2-process cluster e2es (CLAUDE.md quick/slow split)

REPO_ROOT = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_make_global_mesh_single_process():
    """Single-process: delegates to make_mesh over all (8 virtual) devices."""
    import jax

    from multimodal_survival_prediction_tpu.parallel import (
        is_coordinator,
        make_global_mesh,
    )

    mesh = make_global_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    assert set(mesh.devices.ravel()) == set(jax.devices())
    assert is_coordinator()


def test_read_back_on_addressable_and_replicated():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_survival_prediction_tpu.parallel import (
        make_global_mesh,
        read_back,
    )

    mesh = make_global_mesh()
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    g = jax.device_put(x, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(read_back(g), x)
    np.testing.assert_array_equal(read_back(jnp.float32(3.0)), 3.0)
    np.testing.assert_array_equal(read_back(x), x)  # plain numpy passthrough


def test_cv_write_guard_respects_coordinator(tmp_path, monkeypatch):
    """run_cross_validation on a non-coordinator process must compute the
    same payload but write NO artifacts (cv.py's multihost guard)."""
    from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
    from multimodal_survival_prediction_tpu.data.synthetic import (
        SyntheticCohortSpec,
        generate_synthetic_cohort,
    )
    from multimodal_survival_prediction_tpu.parallel import multihost
    from multimodal_survival_prediction_tpu.train.cv import (
        run_cross_validation,
    )

    table, paths = generate_synthetic_cohort(
        tmp_path / "cohort",
        SyntheticCohortSpec(n_patients=24, rna_dim=64, p_imaging=0.0,
                            image_shapes=((8, 12, 12),)))
    monkeypatch.setattr(multihost, "is_coordinator", lambda: False)
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)
    payload, _ = run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"],
        results_dir=tmp_path / "results", models_dir=tmp_path / "models",
        num_epochs=1)
    assert np.isfinite(payload["c_index_mean"])  # payload still computed
    assert not (tmp_path / "results").exists()
    assert not (tmp_path / "models").exists()


def test_two_process_cluster_matches_single_process(tmp_path):
    """Full stack: two `train_rnaseq_only.py --multihost` processes (4 CPU
    devices each) form an 8-device global mesh, train 2-fold CV, and must
    agree with each other AND with the single-process 8-device mesh run on
    the identical (seeded) synthetic cohort. Only the coordinator writes."""
    n_pat, folds, epochs = 32, 2, 2
    port = _free_port()

    def child_env(n_local):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local}")
        env["JAX_PLATFORMS"] = "cpu"
        # CLAUDE.md: clearing the pool IP is MANDATORY for spawned
        # subprocesses — the axon plugin registration can block on the
        # tunnel even under JAX_PLATFORMS=cpu
        env["PALLAS_AXON_POOL_IPS"] = ""
        return env

    def cmd(extra, data_root, results, models):
        return [
            sys.executable,
            str(REPO_ROOT / "scripts" / "training" / "train_rnaseq_only.py"),
            "--synthetic", "--synthetic-patients", str(n_pat),
            "--data-root", str(data_root),
            "--results-dir", str(results), "--models-dir", str(models),
            "--epochs", str(epochs), "--n-folds", str(folds),
        ] + extra

    # --- 2-process cluster (shared results dir; own deterministic cohorts)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            cmd(["--multihost", "--coordinator", f"127.0.0.1:{port}",
                 "--num-processes", "2", "--process-id", str(pid)],
                tmp_path / f"cohort_p{pid}",
                tmp_path / "results_mh", tmp_path / "models_mh"),
            env=child_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, out[-2000:] + err[-2000:]

    mh = json.loads((tmp_path / "results_mh" / "rnaseq_only" /
                     "cv_results.json").read_text())
    assert len(mh["fold_results"]) == folds
    # both processes ran the same replicated trajectory: their printed
    # C-index lines must match exactly
    lines = [next(ln for ln in out.splitlines() if "C-index" in ln)
             for _, out, _ in outs]
    assert lines[0] == lines[1]

    # --- single-process oracle: same cohort spec, 8-device mesh
    r = subprocess.run(
        cmd(["--mesh", "8"], tmp_path / "cohort_sp",
            tmp_path / "results_sp", tmp_path / "models_sp"),
        env=child_env(8), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    sp = json.loads((tmp_path / "results_sp" / "rnaseq_only" /
                     "cv_results.json").read_text())

    # identical global program + inputs; only collective reduction order may
    # differ across the process boundary
    assert np.isclose(mh["c_index_mean"], sp["c_index_mean"], atol=1e-4), (
        mh["c_index_mean"], sp["c_index_mean"])
    for a, b in zip(mh["fold_results"], sp["fold_results"]):
        assert np.isclose(a["best_c_index"], b["best_c_index"], atol=1e-4)


def test_two_process_tensor_parallel_spans_hosts(tmp_path):
    """TP with the model axis spanning BOTH processes (mesh 1×8 over 2×4
    devices): the wide RNA kernels are column-sharded across the process
    boundary, so the Megatron-pattern collectives inside every GEMM cross
    'hosts'. Must train to finite results and agree across processes."""
    port = _free_port()

    def run(pid):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""  # CLAUDE.md subprocess rule
        return subprocess.Popen(
            [sys.executable,
             str(REPO_ROOT / "scripts" / "training" /
                 "train_rnaseq_only.py"),
             "--synthetic", "--synthetic-patients", "24",
             "--data-root", str(tmp_path / f"cohort_p{pid}"),
             "--results-dir", str(tmp_path / "results"),
             "--models-dir", str(tmp_path / "models"),
             "--epochs", "1", "--n-folds", "2",
             "--multihost", "--tp", "8",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)

    procs = [run(0), run(1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, out[-2000:] + err[-2000:]
    payload = json.loads((tmp_path / "results" / "rnaseq_only" /
                          "cv_results.json").read_text())
    assert np.isfinite(payload["c_index_mean"])
    lines = [next(ln for ln in out.splitlines() if "C-index" in ln)
             for _, out, _ in outs]
    assert lines[0] == lines[1]
