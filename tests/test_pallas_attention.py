"""Pallas banded-attention kernel vs the XLA formulation (interpret mode
on CPU; the same code compiles with Mosaic on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.nn import attention as attn_mod
from reconvat_tpu.ops.pallas_attention import pallas_banded_forward


def _inputs(B=2, L=100, H=4, Dh=57, window=31, seed=0):
    rng = np.random.RandomState(seed)
    hw = (window - 1) // 2
    q = rng.randn(B, L, H, Dh).astype(np.float32)
    k = rng.randn(B, L, H, Dh).astype(np.float32)
    v = rng.randn(B, L, H, Dh).astype(np.float32)
    kpad = np.pad(k, ((0, 0), (hw, hw), (0, 0), (0, 0)))
    vpad = np.pad(v, ((0, 0), (hw, hw), (0, 0), (0, 0)))
    rel = (rng.randn(H, Dh, window) * 0.1).astype(np.float32)
    return (jnp.asarray(q), jnp.asarray(kpad), jnp.asarray(vpad),
            jnp.asarray(rel))


@pytest.mark.parametrize("L,window,block", [(100, 31, 64), (64, 7, 64),
                                            (256, 31, 128), (33, 31, 256)])
def test_pallas_matches_xla(L, window, block):
    q, kpad, vpad, rel = _inputs(L=L, window=window)
    ref, _ = attn_mod.banded_attention(q, kpad, vpad, rel, window,
                                       block_size=64, return_probs=False)
    got = pallas_banded_forward(q, kpad, vpad, rel, window, block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_no_rel():
    q, kpad, vpad, _ = _inputs(L=80, window=15)
    ref, _ = attn_mod.banded_attention(q, kpad, vpad, None, 15,
                                       block_size=64, return_probs=False)
    got = pallas_banded_forward(q, kpad, vpad, None, 15, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_custom_vjp_grads():
    q, kpad, vpad, rel = _inputs(L=48, window=7)

    def loss_pallas(q, k, v, r):
        out = attn_mod.banded_attention_pallas(q, k, v, r, 7, 64)
        return jnp.sum(out ** 2)

    def loss_xla(q, k, v, r):
        out, _ = attn_mod.banded_attention(q, k, v, r, 7, block_size=64,
                                           return_probs=False)
        return jnp.sum(out ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, kpad, vpad, rel)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, kpad, vpad, rel)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_module_pallas_impl_matches_xla():

    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 50, 24).astype(np.float32))
    ref_mod = attn_mod.MultiHeadAttention1D(out_features=32, kernel_size=7,
                                            groups=4, impl="xla")
    v = ref_mod.init(jax.random.PRNGKey(0), x)
    out_ref, _ = ref_mod.apply(v, x)

    pal_mod = attn_mod.MultiHeadAttention1D(out_features=32, kernel_size=7,
                                            groups=4, impl="pallas")
    out_pal, attn = pal_mod.apply(v, x)
    assert attn is None
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
