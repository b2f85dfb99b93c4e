"""vat_chain='batched' is exactly the two frozen-BN chains, fused.

The batched mode concatenates the labeled and unlabeled VAT chains into
one frozen-BN (running-statistics) 2B-batch vat_loss invocation
(models/reconvat.ReconVAT.vat_chain). These tests pin its contract: the
per-segment LDS losses, r_norms, and parameter gradients equal running
the SAME frozen-BN chains separately with the same seed directions — the
only cross-segment coupling, the power objective's mean over 2B instead
of B, is a power-of-two rescale that the per-vector l2 normalization
removes exactly (vat.vat_loss split doc).

(The production default stays 'separate' = the reference's train-mode-BN
chains, `model/UNet_onset.py:425-446`; 'batched' is the measured
opt-in — see bench_logs/ and PARITY.md.)
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import reconvat_tpu.models.reconvat as reconvat_mod
import reconvat_tpu.models.unet_onset as unet_onset_mod
from reconvat_tpu import vat as vat_mod

FRAMES = 64
B = 2


def _batches():
    import reconvat_tpu.constants as C

    rng = np.random.RandomState(0)
    samples = FRAMES * C.HOP_LENGTH
    batch_l = {
        "audio": jnp.asarray(rng.randn(B, samples) * 0.1, jnp.float64),
        "frame": jnp.asarray(rng.rand(B, FRAMES, 88) < 0.05, jnp.float64),
        "onset": jnp.asarray(rng.rand(B, FRAMES, 88) < 0.01, jnp.float64),
    }
    batch_ul = {"audio": jnp.asarray(rng.randn(B, samples) * 0.1,
                                     jnp.float64)}
    return batch_l, batch_ul


def _f64(variables):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64) if jnp.issubdtype(
            x.dtype, jnp.floating) else x, variables)


def _losses_and_grads(model, variables, batch_l, batch_ul, key):
    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        _, losses, _, _ = model.run_on_batch(v, batch_l, batch_ul, key,
                                             vat=True, train=True)
        leaves = jax.tree_util.tree_leaves(losses)
        return sum(leaves[1:], leaves[0]), losses

    (_, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    return losses, grads


@pytest.mark.parametrize("family", ["reconvat", "unet_onset"])
def test_batched_chain_equals_separate_frozen_chains(family, monkeypatch):
    jax.config.update("jax_enable_x64", True)
    try:
        make = (reconvat_mod.ReconVAT if family == "reconvat"
                else unet_onset_mod.UNetOnset)
        module_mod = (reconvat_mod if family == "reconvat"
                      else unet_onset_mod)
        kwargs = dict(reconstruction=True, attn_impl="xla",
                      conv_layout="nhwc")
        key = jax.random.PRNGKey(7)
        batch_l, batch_ul = _batches()

        model_b = make(vat_chain="batched", **kwargs)
        variables = _f64(model_b.init(jax.random.PRNGKey(0),
                                      seq_frames=FRAMES))

        # replicate run_on_batch's internal key sequence to learn the
        # batched mode's d key (k_ul split happens in both modes)
        _k_ul, key2 = jax.random.split(key)
        k_l, _ = jax.random.split(key2)
        d_all = jax.random.normal(
            k_l, (2 * B, FRAMES, model_b.n_bins, 1), jnp.float64)

        losses_b, grads_b = _losses_and_grads(model_b, variables,
                                              batch_l, batch_ul, key)

        # baseline: SEPARATE chains, forced to the same frozen-BN target
        # and the same per-segment seed directions (ul chain runs first)
        model_s = make(vat_chain="separate", **kwargs)
        orig_fn = make._transcriber_fn

        def frozen_fn(self, variables, train):
            return orig_fn(self, variables, False)

        monkeypatch.setattr(make, "_transcriber_fn", frozen_fn)
        calls = []
        real_vat = vat_mod.vat_loss

        def pinned_d(apply_fn, x, k, cfg, init_d=None, y_ref=None):
            seg = d_all[B:] if not calls else d_all[:B]
            calls.append(1)
            return real_vat(apply_fn, x, k, cfg, init_d=seg, y_ref=y_ref)

        monkeypatch.setattr(module_mod, "vat_loss", pinned_d)
        losses_s, grads_s = _losses_and_grads(model_s, variables,
                                              batch_l, batch_ul, key)
        assert len(calls) == 2

        assert set(losses_b) == set(losses_s)
        for k in losses_s:
            np.testing.assert_allclose(np.asarray(losses_b[k]),
                                       np.asarray(losses_s[k]),
                                       rtol=1e-12, atol=1e-12, err_msg=k)
        for a, b in zip(jax.tree_util.tree_leaves(grads_b),
                        jax.tree_util.tree_leaves(grads_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_separate_default_unchanged():
    """vat_chain defaults to the reference semantics."""
    assert reconvat_mod.ReconVAT().vat_chain == "separate"
    assert unet_onset_mod.UNetOnset().vat_chain == "separate"
