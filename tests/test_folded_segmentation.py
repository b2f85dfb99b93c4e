"""Frequency-folded Segmentation layout: parity with the NHWC path.

Same scheme as tests/test_folded_unet.py: the folded layout is a pure
re-layout of the identical logical computation over the same parameter
tree. Dropout is disabled where bit-comparability is asserted (the folded
layout draws masks on folded shapes — documented divergence in
models/segmentation.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconvat_tpu.models.segmentation import SegmentationModule


def _mods(out_class, dropout=0.0):
    return (SegmentationModule(out_class=out_class, dropout_rate=dropout,
                               conv_layout="nhwc"),
            SegmentationModule(out_class=out_class, dropout_rate=dropout,
                               conv_layout="folded"))


@pytest.mark.parametrize("out_class", [1, 2])
def test_seg_folded_matches_nhwc_eval(out_class):
    x = np.random.RandomState(0).rand(1, 64, 229, 1).astype(np.float32)
    m_n, m_f = _mods(out_class)
    v = m_n.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                 train=False)
    out_n = m_n.apply(v, jnp.asarray(x), train=False)
    out_f = m_f.apply(v, jnp.asarray(x), train=False)
    assert out_n.shape == out_f.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               atol=5e-6)


def test_seg_folded_matches_nhwc_train_stats():
    """Train mode: masked batch statistics must equal the NHWC ones
    (carry bins excluded, true bin count), including the running-stat
    updates."""
    x = np.random.RandomState(1).rand(2, 32, 229, 1).astype(np.float32)
    m_n, m_f = _mods(1)
    v = m_n.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                 train=False)
    out_n, mut_n = m_n.apply(v, jnp.asarray(x), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    out_f, mut_f = m_f.apply(v, jnp.asarray(x), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    # fp32: batch-stat rsqrt cascades amplify conv reduction-order noise
    # through 15 pre-activation BNs; float64 agreement (the exactness
    # test below) pins the semantics to ~1e-12
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               atol=2e-4)
    ln = jax.tree_util.tree_leaves(mut_n)
    lf = jax.tree_util.tree_leaves(mut_f)
    for a, b in zip(lf, ln):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


def test_seg_folded_exact_in_float64():
    """The folded layout is the identical computation: in float64 the
    outputs agree to ~1e-13 (fp32 diffs are reduction-order noise)."""
    with jax.enable_x64():
        x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 229, 1),
                        jnp.float64)
        m_n, m_f = _mods(1)
        v = m_n.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
        out_n = m_n.apply(v, x, train=False)
        out_f = m_f.apply(v, x, train=False)
        err = float(jnp.max(jnp.abs(out_f - out_n)))
        assert err < 1e-12, err

        # train mode: masked batch statistics + running updates
        tn, mn = m_n.apply(v, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        tf_, mf = m_f.apply(v, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
        err = float(jnp.max(jnp.abs(tf_ - tn)))
        assert err < 1e-11, err
        for a, b in zip(jax.tree_util.tree_leaves(mf),
                        jax.tree_util.tree_leaves(mn)):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-11


def test_seg_folded_gradients_exact_in_float64():
    """d(loss)/d(params) through the folded train-mode forward matches
    the NHWC layout to float64 exactness (~1e-14) — the backward is the
    identical computation; fp32 runs differ only by reduction-order
    noise amplified through the 15-BN pre-activation cascade (measured
    max ~8e-4 absolute, same as the forward)."""
    with jax.enable_x64():
        x = jnp.asarray(np.random.RandomState(3).rand(1, 32, 229, 1),
                        jnp.float64)
        t = jnp.asarray(np.random.RandomState(4).rand(1, 32, 88) > 0.9,
                        jnp.float64)
        m_n, m_f = _mods(1)
        v = m_n.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, v)

        def loss(params, m):
            out, _ = m.apply({"params": params,
                              "batch_stats": v["batch_stats"]},
                             x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean((out - t) ** 2)

        ln, gn = jax.value_and_grad(loss)(v["params"], m_n)
        lf, gf = jax.value_and_grad(loss)(v["params"], m_f)
        assert abs(float(lf) - float(ln)) < 1e-14
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gn)):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-12


@pytest.mark.parametrize("n_bins", [229, 386])
def test_seg_folded_arbitrary_shape(n_bins):
    """Folded path at a non-640 frame count, odd time sizes (the
    bucketed full-song eval shapes), and the CFP frontend's 386 bins —
    the latter exercises refold()'s extra-carry-block zero padding
    (193 half-res bins: k=2 carries 194, k=4 carries 196)."""
    x = np.random.RandomState(5).rand(1, 101, n_bins, 1).astype(np.float32)
    m_n, m_f = _mods(1)
    v = m_n.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                 train=False)
    out_n = m_n.apply(v, jnp.asarray(x), train=False)
    out_f = m_f.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               atol=5e-6)
