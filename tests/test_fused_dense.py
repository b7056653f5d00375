"""ops/fused_dense — the fused train-mode BN->ReLU->1x1-conv Pallas kernels
(round-4 HBM lever), run in interpret mode on CPU and pinned against the
plain-XLA oracle and the unfused DenseNet path (values, batch stats, AND
gradients through the custom VJP). The fused path targets the DenseNet
dense-layer stage 1 (reference partial_modality_training.py:171-176 /
MONAI _DenseLayer norm1/relu1/conv1)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_survival_prediction_tpu.models.densenet3d import (
    DenseNet121_3D,
)
from multimodal_survival_prediction_tpu.ops.fused_dense import (
    bn_relu_conv1x1_reference,
    fused_bn_relu_conv1x1,
)


def _data(n=96, c=24, f=16, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, c)) * 2.0 + 0.5, dtype)
    scale = jnp.asarray(rng.normal(size=(c,)) * 0.3 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, f)) / np.sqrt(c), dtype)
    return x, scale, bias, w


def test_fused_matches_reference_fp32():
    x, scale, bias, w = _data()
    out, mean, var = fused_bn_relu_conv1x1(x, scale, bias, w)
    ref, rmean, rvar = bn_relu_conv1x1_reference(x, scale, bias, w)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mean, rmean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var, rvar, rtol=1e-5, atol=1e-6)


def test_fused_matches_reference_bf16():
    x, scale, bias, w = _data(dtype=jnp.bfloat16)
    out, mean, var = fused_bn_relu_conv1x1(x, scale, bias, w)
    ref, rmean, rvar = bn_relu_conv1x1_reference(x, scale, bias, w)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.02, atol=0.02)
    np.testing.assert_allclose(mean, rmean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(var, rvar, rtol=1e-4, atol=1e-5)


def test_fused_grads_match_reference_fp32():
    """The custom VJP (two Pallas reduce/dx passes) against jax.grad of the
    plain-XLA oracle — dx, dgamma, dbeta, dW all match."""
    x, scale, bias, w = _data()
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=(x.shape[0], w.shape[1])),
        jnp.float32)

    def loss(fn, *args):
        out, _mean, _var = fn(*args)
        return (out * cot).sum()

    gf = jax.grad(lambda *a: loss(fused_bn_relu_conv1x1, *a),
                  argnums=(0, 1, 2, 3))(x, scale, bias, w)
    gr = jax.grad(lambda *a: loss(bn_relu_conv1x1_reference, *a),
                  argnums=(0, 1, 2, 3))(x, scale, bias, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_densenet_fused_bn1_matches_standard():
    """DenseNet121_3D(fused_bn1=True) is the SAME function as the standard
    path: bit-identical init (the _Norm1Vars/_Conv1Vars path twins derive
    the same RNG streams), matching train-mode forward values, updated
    batch_stats, and gradients — with dropout active (same rng consumption
    order). Checkpoints are interchangeable across modes."""
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 16, 16, 8, 1)), jnp.float32)
    outs, stats, grads, inits, trees = [], [], [], [], []
    for fused in (False, True):
        m = DenseNet121_3D(out_features=8, block_config=(2, 3),
                           init_features=8, growth_rate=4, dropout=0.3,
                           fused_bn1=fused)
        # train=True init exercises the fused branch's variable declarations
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)}, x, train=True)
        inits.append(v)
        trees.append(jax.tree_util.tree_structure(v))

        def loss(p, v=v, m=m):
            out, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (out ** 2).sum(), mut["batch_stats"]

        (val, bs), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        outs.append(float(val))
        stats.append(jax.tree_util.tree_leaves(bs))
        grads.append(jax.tree_util.tree_leaves(g))

    assert trees[0] == trees[1]  # checkpoint-interchangeable
    for a, b in zip(jax.tree_util.tree_leaves(inits[0]),
                    jax.tree_util.tree_leaves(inits[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert outs[0] == float(np.float32(outs[0]))  # sanity: finite
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)
    for a, b in zip(stats[0], stats[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    for a, b in zip(grads[0], grads[1]):
        # atol 1e-5: under the 8-virtual-device CPU backend XLA's reduction
        # order differs slightly between the two programs (measured 2.5e-6
        # max abs on the conv0 grad) — pure f32 summation noise
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_densenet_fused_bn1_rows_threshold():
    """fused_bn1=<int> fuses only stages whose trunk rows (B*D*H*W) are at
    or below the threshold (the selective policy from the round-4 per-shape
    microbench) — a mixed fused/standard model still matches the standard
    path bit-for-bit at init and numerically in train mode."""
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(2, 16, 16, 8, 1)), jnp.float32)
    # block0 runs at 2*4*4*2=64 rows, block1 at 2*2*2*1=8 rows -> threshold 8
    # fuses ONLY block1 (+ nothing else), exercising the mixed tree
    outs = []
    for fused in (False, 8):
        m = DenseNet121_3D(out_features=8, block_config=(2, 2),
                           init_features=8, growth_rate=4, fused_bn1=fused)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)}, x, train=True)
        out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_densenet_fused_bn1_eval_falls_back():
    """Eval mode never takes the fused path (it needs batch statistics) —
    train=False forward from a fused-mode checkpoint equals the standard
    path exactly."""
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 16, 16, 8, 1)), jnp.float32)
    ref = None
    for fused in (False, True):
        m = DenseNet121_3D(out_features=8, block_config=(2, 2),
                           init_features=8, growth_rate=4, fused_bn1=fused)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)}, x, train=False)
        out = m.apply(v, x, train=False)
        if ref is None:
            ref = np.asarray(out)
        else:
            np.testing.assert_array_equal(np.asarray(out), ref)
