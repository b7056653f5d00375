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
