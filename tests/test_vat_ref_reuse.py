"""The clean-forward reuse in ReconVAT/UNetOnset VAT is exact.

run_on_batch hands the supervised forward's clean prediction to vat_loss
as the stop-grad reference (y_ref=) instead of paying a second identical
forward (the VAT-target paths of these two families are deterministic).
These tests recompute every loss with a vat_loss that ignores y_ref —
i.e. the pre-reuse behavior — and assert the full loss dict matches to
f64 round-off, for both reconstruction modes, including gradients.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reconvat_tpu.models.reconvat as reconvat_mod
import reconvat_tpu.models.unet_onset as unet_onset_mod
from reconvat_tpu import vat as vat_mod

FRAMES = 64
B = 2


def _batches(model, key):
    import reconvat_tpu.constants as C

    rng = np.random.RandomState(0)
    samples = FRAMES * C.HOP_LENGTH
    batch_l = {
        "audio": jnp.asarray(rng.randn(B, samples) * 0.1, jnp.float64),
        "frame": jnp.asarray(rng.rand(B, FRAMES, 88) < 0.05, jnp.float64),
    }
    batch_l["onset"] = jnp.asarray(rng.rand(B, FRAMES, 88) < 0.01,
                                   jnp.float64)
    batch_ul = {"audio": jnp.asarray(rng.randn(B, samples) * 0.1,
                                     jnp.float64)}
    return batch_l, batch_ul


def _losses_and_grads(model, module_mod, batch_l, batch_ul, variables, key,
                      ignore_y_ref: bool, monkeypatch):
    if ignore_y_ref:
        real = vat_mod.vat_loss

        def no_reuse(apply_fn, x, k, cfg, init_d=None, y_ref=None):
            return real(apply_fn, x, k, cfg, init_d=init_d)

        monkeypatch.setattr(module_mod, "vat_loss", no_reuse)
    else:
        monkeypatch.setattr(module_mod, "vat_loss", vat_mod.vat_loss)

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        _, losses, _, _ = model.run_on_batch(v, batch_l, batch_ul, key,
                                             vat=True, train=True)
        leaves = [x for x in jax.tree_util.tree_leaves(losses)]
        return sum(leaves[1:], leaves[0]), losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    return total, losses, grads


@pytest.mark.parametrize("family,reconstruction", [
    ("reconvat", True), ("reconvat", False),
    ("unet_onset", True), ("unet_onset", False),
])
def test_clean_forward_reuse_is_exact(family, reconstruction, monkeypatch):
    jax.config.update("jax_enable_x64", True)
    try:
        if family == "reconvat":
            model = reconvat_mod.ReconVAT(reconstruction=reconstruction,
                                          attn_impl="xla",
                                          conv_layout="nhwc")
            module_mod = reconvat_mod
        else:
            model = unet_onset_mod.UNetOnset(reconstruction=reconstruction,
                                             attn_impl="xla",
                                             conv_layout="nhwc")
            module_mod = unet_onset_mod
        key = jax.random.PRNGKey(7)
        variables = model.init(jax.random.PRNGKey(0), seq_frames=FRAMES)
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64) if jnp.issubdtype(
                x.dtype, jnp.floating) else x, variables)
        batch_l, batch_ul = _batches(model, key)

        run = functools.partial(_losses_and_grads, model, module_mod,
                                batch_l, batch_ul, variables, key,
                                monkeypatch=monkeypatch)
        t_new, l_new, g_new = run(ignore_y_ref=False)
        t_old, l_old, g_old = run(ignore_y_ref=True)

        assert set(l_new) == set(l_old)
        for k in l_old:
            np.testing.assert_allclose(np.asarray(l_new[k]),
                                       np.asarray(l_old[k]),
                                       rtol=1e-12, atol=1e-12, err_msg=k)
        flat_new = jax.tree_util.tree_leaves(g_new)
        flat_old = jax.tree_util.tree_leaves(g_old)
        for a, b in zip(flat_new, flat_old):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_application_reuse_is_exact(monkeypatch):
    """run_on_batch_application reuses the clean forward for both the
    unlabeled and the labeled chain; same exactness contract."""
    jax.config.update("jax_enable_x64", True)
    try:
        model = reconvat_mod.ReconVAT(reconstruction=True, attn_impl="xla",
                                      conv_layout="nhwc")
        key = jax.random.PRNGKey(3)
        variables = model.init(jax.random.PRNGKey(0), seq_frames=FRAMES)
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64) if jnp.issubdtype(
                x.dtype, jnp.floating) else x, variables)
        batch_l, batch_ul = _batches(model, key)

        def losses_with(ignore):
            if ignore:
                real = vat_mod.vat_loss

                def no_reuse(apply_fn, x, k, cfg, init_d=None, y_ref=None):
                    return real(apply_fn, x, k, cfg, init_d=init_d)

                monkeypatch.setattr(reconvat_mod, "vat_loss", no_reuse)
            else:
                monkeypatch.setattr(reconvat_mod, "vat_loss",
                                    vat_mod.vat_loss)
            _, losses, _, _ = model.run_on_batch_application(
                variables, batch_l, batch_ul, key, vat=True, train=True)
            return losses

        l_new, l_old = losses_with(False), losses_with(True)
        assert set(l_new) == set(l_old)
        for k in l_old:
            np.testing.assert_allclose(np.asarray(l_new[k]),
                                       np.asarray(l_old[k]),
                                       rtol=1e-12, atol=1e-12, err_msg=k)
    finally:
        jax.config.update("jax_enable_x64", False)
