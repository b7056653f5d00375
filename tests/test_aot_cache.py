"""AOT executable cache: compile-once/load-anywhere (io/aot_cache.py).

The cache can only ever save time, never change results — these tests pin
the hit/miss/fallback state machine and that a loaded executable computes
the same numbers as the compile it replaces.
"""

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_survival_prediction_tpu.io import aot_cache


def _fn():
    return jax.jit(lambda x, y: (x @ y).sum(axis=1) * 2.0)


def _args(n=4):
    return (jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
            jnp.ones((3, 5), jnp.float32))


def test_miss_then_hit_same_results(tmp_path):
    f = _fn()
    x, y = _args()
    want = np.asarray(f(x, y))

    c1, info1 = aot_cache.cached_compile(f, x, y, cache_dir=tmp_path)
    assert info1["source"] == "compile"
    np.testing.assert_allclose(np.asarray(c1(x, y)), want)
    # entry + human-readable meta exist
    assert (tmp_path / f"{info1['key']}.jaxexe").exists()
    meta = json.loads(
        (tmp_path / f"{info1['key']}.meta.json").read_text())
    assert meta["platform"] == "cpu"

    c2, info2 = aot_cache.cached_compile(_fn(), x, y, cache_dir=tmp_path)
    assert info2["source"] == "cache"
    assert info2["key"] == info1["key"]
    np.testing.assert_allclose(np.asarray(c2(x, y)), want)


def test_key_separates_programs_and_shapes(tmp_path):
    f = _fn()
    x, y = _args(4)
    k1 = aot_cache.program_key(f.lower(x, y))
    k2 = aot_cache.program_key(f.lower(*_args(6)))  # different batch
    g = jax.jit(lambda x, y: (x @ y).sum())  # different program
    k3 = aot_cache.program_key(g.lower(x, y))
    assert len({k1, k2, k3}) == 3
    # extra parts perturb the key too
    assert aot_cache.program_key(f.lower(x, y), extra=("ckpt-a",)) != k1


def test_corrupt_entry_falls_back_to_compile(tmp_path):
    f = _fn()
    x, y = _args()
    _, info = aot_cache.cached_compile(f, x, y, cache_dir=tmp_path)
    path = tmp_path / f"{info['key']}.jaxexe"
    path.write_bytes(b"not a pickle")
    c, info2 = aot_cache.cached_compile(_fn(), x, y, cache_dir=tmp_path)
    assert info2["source"] == "compile"  # fell back, did not crash
    np.testing.assert_allclose(np.asarray(c(x, y)),
                               np.asarray(f(x, y)))


def test_env_drift_refuses_entry(tmp_path):
    f = _fn()
    x, y = _args()
    _, info = aot_cache.cached_compile(f, x, y, cache_dir=tmp_path)
    path = tmp_path / f"{info['key']}.jaxexe"
    blob = pickle.loads(path.read_bytes())
    blob["env"]["jax"] = "0.0.0-other"
    path.write_bytes(pickle.dumps(blob))
    assert aot_cache.load_executable(tmp_path, info["key"]) is None


def test_vmapped_ensemble_program_roundtrips(tmp_path):
    # the serving fold-ensemble shape: params stacked on a leading axis,
    # jit(vmap(apply, in_axes=(0, None)))
    k = jax.random.PRNGKey(0)
    stacked_w = jax.random.normal(k, (3, 5, 2))  # 3 folds
    xb = jnp.ones((4, 5), jnp.float32)
    f = jax.jit(jax.vmap(lambda w, x: x @ w, in_axes=(0, None)))
    want = np.asarray(f(stacked_w, xb))
    c, info = aot_cache.cached_compile(f, stacked_w, xb, cache_dir=tmp_path)
    assert info["source"] == "compile"
    loaded, info2 = aot_cache.cached_compile(
        f, stacked_w, xb, cache_dir=tmp_path)
    assert info2["source"] == "cache"
    np.testing.assert_allclose(np.asarray(loaded(stacked_w, xb)), want,
                               rtol=1e-6)


def test_mesh_sharded_program_roundtrips(tmp_path):
    # a pjit program over a 4-device mesh: the cached executable must
    # reload onto the SAME ordered device list, not all client devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    xs = jax.device_put(jnp.arange(8, dtype=jnp.float32), sh)
    f = jax.jit(lambda a: (a * 2).sum(), in_shardings=(sh,))
    want = float(f(xs))
    _, info1 = aot_cache.cached_compile(f, xs, cache_dir=tmp_path)
    assert info1["source"] == "compile"
    loaded, info2 = aot_cache.cached_compile(f, xs, cache_dir=tmp_path)
    assert info2["source"] == "cache"
    assert float(loaded(xs)) == want


def test_aot_cached_function_specializes_per_shape(tmp_path):
    # the Trainer-facing wrapper: one disk entry per call signature,
    # dispatched transparently like jit's own in-memory cache
    f = aot_cache.AOTCachedFunction(_fn(), tmp_path, tag="t")
    x4, y = _args(4)
    x6, _ = _args(6)
    np.testing.assert_allclose(np.asarray(f(x4, y)),
                               np.asarray(_fn()(x4, y)))
    np.testing.assert_allclose(np.asarray(f(x6, y)),
                               np.asarray(_fn()(x6, y)))
    assert len(f.info) == 2
    assert all(v["source"] == "compile" for v in f.info.values())
    # repeat call: in-memory dispatch, no new entries
    f(x4, y)
    assert len(f.info) == 2
    # a FRESH wrapper (fresh process stand-in) loads both from disk
    g = aot_cache.AOTCachedFunction(_fn(), tmp_path, tag="t")
    np.testing.assert_allclose(np.asarray(g(x4, y)),
                               np.asarray(_fn()(x4, y)))
    g(x6, y)
    assert all(v["source"] == "cache" for v in g.info.values())


def test_trainer_aot_cache_matches_uncached(tmp_path):
    """Trainer(aot_cache_dir=...) — the --aot-cache CLI path — must (a)
    reproduce the uncached trainer's trajectory exactly, (b) persist its
    scan-epoch/eval executables, and (c) let a FRESH trainer load them
    instead of recompiling."""
    import jax.numpy as jnp

    from multimodal_survival_prediction_tpu.models import RNASeqSurvivalModel
    from multimodal_survival_prediction_tpu.train.engine import (
        TrainConfig,
        Trainer,
    )

    rng = np.random.default_rng(3)
    n, d = 20, 32
    host = {
        "rnaseq": rng.normal(size=(n, d)).astype(np.float32),
        "time": rng.exponential(300.0, size=n).astype(np.float32),
        "event": (rng.uniform(size=n) < 0.7).astype(np.float32),
        "svalid": np.ones(n, np.float32),
    }
    host["event"][:3] = 1.0
    data = {k: jnp.asarray(v) for k, v in host.items()}
    model = RNASeqSurvivalModel(hidden_dims=(16,))
    cfg = TrainConfig(batch_size=8)

    def run(cache_dir):
        tr = Trainer(model, lambda b: (b["rnaseq"],), None, cfg,
                     aot_cache_dir=cache_dir)
        example = {k: v[:8] for k, v in host.items()}
        example["valid"] = example["svalid"]
        state = tr.init_state(example, fold=1)
        for _ in range(2):
            state, loss = tr.train_epoch(state, data, np.arange(n),
                                         np.random.default_rng(9), 1e-3,
                                         jax.random.PRNGKey(1))
        ci, mloss, _ = tr.evaluate(state, data, np.arange(n))
        return jax.device_get(state.params), loss, ci, mloss, tr

    p0, l0, c0, m0, _ = run(None)
    p1, l1, c1, m1, tr1 = run(tmp_path)
    assert (l0, c0, m0) == (l1, c1, m1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)
    assert all(v["source"] == "compile"
               for v in tr1._train_epoch_fn.info.values())
    assert list(tmp_path.glob("*.jaxexe"))  # persisted

    p2, l2, c2, m2, tr2 = run(tmp_path)  # fresh trainer, warm cache
    assert (l1, c1, m1) == (l2, c2, m2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
    assert all(v["source"] == "cache"
               for v in tr2._train_epoch_fn.info.values())
    assert all(v["source"] == "cache" for v in tr2._eval_fn.info.values())


def test_store_failure_still_returns_compiled(tmp_path, monkeypatch):
    f = _fn()
    x, y = _args()

    def boom(*a, **kw):
        raise RuntimeError("backend refuses serialization")

    monkeypatch.setattr(aot_cache, "save_executable", boom)
    c, info = aot_cache.cached_compile(f, x, y, cache_dir=tmp_path)
    assert info["source"] == "compile"
    np.testing.assert_allclose(np.asarray(c(x, y)), np.asarray(f(x, y)))
    assert not (tmp_path / f"{info['key']}.jaxexe").exists()


@pytest.mark.slow
def test_fold_parallel_aot_cache_matches_uncached(tmp_path):
    """run_cross_validation_parallel(aot_cache_dir=...) — the
    --fold-parallel --aot-cache CLI combination — must reproduce the
    uncached fold-parallel run's fold results exactly and persist its
    vmapped epoch/eval executables (the most expensive compiles in the
    repo on remote-compile links)."""
    from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
    from multimodal_survival_prediction_tpu.data.synthetic import (
        SyntheticCohortSpec,
        generate_synthetic_cohort,
    )
    from multimodal_survival_prediction_tpu.train.cv_parallel import (
        run_cross_validation_parallel,
    )

    table, paths = generate_synthetic_cohort(
        tmp_path / "cohort",
        SyntheticCohortSpec(n_patients=24, rna_dim=48, p_imaging=0.0,
                            image_shapes=((8, 12, 12),)))
    cfg = RNASEQ_ONLY.with_overrides(n_folds=2)

    def run(cache_dir, sub):
        return run_cross_validation_parallel(
            cfg, table, rnaseq_csv=paths["rnaseq_csv"],
            results_dir=tmp_path / sub / "r", models_dir=tmp_path / sub / "m",
            num_epochs=2, aot_cache_dir=cache_dir)

    cache = tmp_path / "aot"
    p0, o0 = run(None, "uncached")
    p1, o1 = run(cache, "cached")
    assert list(cache.glob("*.jaxexe"))  # vmapped programs persisted
    p2, o2 = run(cache, "warm")  # fresh driver call, warm cache

    for oa, ob in zip(o0, o1):
        assert oa.best_c_index == ob.best_c_index
        assert oa.best_epoch == ob.best_epoch
        for ha, hb in zip(oa.history, ob.history):
            assert ha["train_loss"] == hb["train_loss"]
    for ob, oc in zip(o1, o2):
        assert ob.best_c_index == oc.best_c_index
        for hb, hc in zip(ob.history, oc.history):
            assert hb["train_loss"] == hc["train_loss"]
