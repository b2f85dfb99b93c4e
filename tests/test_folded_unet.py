"""Frequency-folded U-Net layout: parity with the NHWC reference path.

The folded layout (nn/unet.py) is a pure re-layout of the same logical
computation over the same parameter tree, so outputs must match the NHWC
path to fp32 reduction-order noise in eval mode. Train mode normalizes by
batch statistics (rsqrt of small variances amplifies conv accumulation
differences through the three chained U-Net passes), so it gets a looser
tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconvat_tpu.models.reconvat import UNet
from reconvat_tpu.models.unet_onset import UNetOnsetModule
from reconvat_tpu.nn.unet import FoldSpec, unet_fold_specs, unfold_channels


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(1e-12, np.max(np.abs(a)))


def test_fold_specs_standard_bins():
    f1, f2, f3, f4 = unet_fold_specs(229)
    assert [(f.F, f.k, f.blocks) for f in (f1, f2, f3, f4)] == [
        (229, 8, 29), (114, 4, 29), (57, 2, 29), (28, 1, 28)]
    # every folded level presents exactly 128 lanes for the 16/32/64/128
    # channel widths
    assert [f.k * c for f, c in zip((f1, f2, f3, f4), (16, 32, 64, 128))] \
        == [128, 128, 128, 128]


def test_fold_unfold_roundtrip():
    fs = FoldSpec(229, 8)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 229).astype(
        np.float32))
    xf = fs.fold3(x)
    assert xf.shape == (2, 8, 29, 8)
    (back,) = unfold_channels(xf, fs, 1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("n_bins", [229, 176, 201])
def test_unet_folded_matches_nhwc_eval(n_bins):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, n_bins, 1).astype(np.float32))
    plain = UNet(n_bins=n_bins, conv_layout="nhwc")
    fold = UNet(n_bins=n_bins, conv_layout="folded")
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    out_p = plain.apply(v, x, train=False)
    out_f = fold.apply(v, x, train=False)
    for name, a, b in zip(("recon", "roll", "roll2", "attn"), out_p, out_f):
        assert _rel_err(a, b) < 2e-5, name


def test_unet_folded_matches_nhwc_train_stats():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 32, 229, 1).astype(np.float32))
    plain = UNet(conv_layout="nhwc")
    fold = UNet(conv_layout="folded")
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    out_p, st_p = plain.apply(v, x, train=True, mutable=["batch_stats"])
    out_f, st_f = fold.apply(v, x, train=True, mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(st_p),
                    jax.tree_util.tree_leaves(st_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for name, a, b in zip(("recon", "roll", "roll2"), out_p, out_f):
        assert _rel_err(a, b) < 2e-2, name


def test_unet_onset_folded_matches_nhwc():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 32, 229, 1).astype(np.float32))
    plain = UNetOnsetModule(conv_layout="nhwc")
    fold = UNetOnsetModule(conv_layout="folded")
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    out_p = plain.apply(v, x, train=False)
    out_f = fold.apply(v, x, train=False)
    for name, a, b in zip(("recon", "roll", "onset", "roll2", "onset2",
                           "attn"), out_p, out_f):
        assert _rel_err(a, b) < 2e-5, name


def test_folded_exact_in_float64():
    """In float64 the folded path is bit-for-bit the same computation:
    loss and all gradients agree to ~1e-13. fp32 train-mode differences
    are therefore pure accumulation-order conditioning, not semantics."""
    with jax.enable_x64():
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.rand(2, 16, 229, 1))
        target = jnp.asarray((rng.rand(2, 16, 88) > 0.9).astype(np.float64))
        plain = UNet(conv_layout="nhwc")
        fold = UNet(conv_layout="folded")
        v = plain.init(jax.random.PRNGKey(0), x, train=False)
        v = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), v)

        def loss(params, model):
            vv = {"params": params, "batch_stats": v["batch_stats"]}
            out, _ = model.apply(vv, x, train=True,
                                 mutable=["batch_stats"])
            _, roll, roll2, _ = out
            return jnp.mean((roll - target) ** 2) + jnp.mean(roll2 ** 2)

        lp, gp = jax.value_and_grad(loss)(v["params"], plain)
        lf, gf = jax.value_and_grad(loss)(v["params"], fold)
        assert abs(float(lp - lf)) / float(lp) < 1e-12
        flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
        for path, a in jax.tree_util.tree_leaves_with_path(gp):
            d = float(np.max(np.abs(np.asarray(a) - np.asarray(flat_f[path]))))
            assert d < 1e-10, (path, d)


def test_folded_gradients_match_nhwc():
    """The folded kernels are built from the logical params by scatter;
    gradients must flow back identically (the fold is a fixed linear
    embedding of the parameter space)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 32, 229, 1).astype(np.float32))
    target = jnp.asarray((rng.rand(2, 32, 88) > 0.9).astype(np.float32))
    plain = UNet(conv_layout="nhwc")
    fold = UNet(conv_layout="folded")
    v = plain.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, model):
        vv = {"params": params, "batch_stats": v["batch_stats"]}
        out, _ = model.apply(vv, x, train=True, mutable=["batch_stats"])
        _, roll, roll2, _ = out
        return jnp.mean((roll - target) ** 2) + jnp.mean(roll2 ** 2)

    lp, gp = jax.value_and_grad(loss)(v["params"], plain)
    lf, gf = jax.value_and_grad(loss)(v["params"], fold)
    np.testing.assert_allclose(float(lp), float(lf), rtol=1e-4)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    checked = 0
    for path, a in flat_p:
        b = flat_f[path]
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # fp32 tolerances are loose by design: train-mode BN divides by
        # batch std, amplifying fp32 accumulation-order differences
        # through three chained U-Nets (individual entries can move tens
        # of percent). test_folded_exact_in_float64 carries the exact
        # parity burden; this test guards against gross wiring errors
        # (wrong kernels/sign/shift would blow far past 0.3).
        tol = 1e-4 + 0.3 * np.max(np.abs(a))
        assert np.max(np.abs(a - b)) < tol, path
        checked += 1
    assert checked > 100


def test_folded_bf16_matches_nhwc_bf16():
    """The production TPU configuration is folded + bf16 compute
    together: both layouts under compute dtype bf16 must agree (bin
    probabilities land on the same bf16 grid up to reduction order)."""
    x = np.random.RandomState(6).rand(1, 64, 229, 1).astype(np.float32)
    m_f = UNet(n_bins=229, reconstruction=True, conv_layout="folded",
               dtype="bfloat16")
    m_n = UNet(n_bins=229, reconstruction=True, conv_layout="nhwc",
               dtype="bfloat16")
    v = m_n.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    _, roll_f, roll2_f, _ = m_f.apply(v, jnp.asarray(x), train=False)
    _, roll_n, roll2_n, _ = m_n.apply(v, jnp.asarray(x), train=False)
    assert roll_f.dtype == jnp.float32  # heads stay fp32
    np.testing.assert_allclose(np.asarray(roll_f), np.asarray(roll_n),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(roll2_f), np.asarray(roll2_n),
                               atol=5e-4)


def test_layout_resolvers_reject_unknown_strings(monkeypatch):
    """A typo'd layout (e.g. RECONVAT_UNET_LAYOUT=fold) must error, not
    silently run the nhwc path and corrupt an A/B measurement."""
    import pytest

    from reconvat_tpu.models.segmentation import resolve_seg_layout
    from reconvat_tpu.nn.unet import resolve_conv_layout

    assert resolve_conv_layout("nhwc") == "nhwc"
    assert resolve_seg_layout("folded") == "folded"
    for fn, env in ((resolve_conv_layout, "RECONVAT_UNET_LAYOUT"),
                    (resolve_seg_layout, "RECONVAT_SEG_LAYOUT")):
        with pytest.raises(ValueError, match="unknown"):
            fn("fold")
        monkeypatch.setenv(env, "foldd")
        with pytest.raises(ValueError, match=env):
            fn("auto")
        monkeypatch.delenv(env)
