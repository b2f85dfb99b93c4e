"""Pallas banded-attention backward kernel vs the XLA VJP."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.nn.attention import banded_attention
from reconvat_tpu.ops.pallas_attention_bwd import pallas_banded_backward


def _setup(B=2, L=100, H=4, Dh=57, W=31, seed=0):
    rng = np.random.RandomState(seed)
    hw = (W - 1) // 2
    q = jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32))
    kpad = jnp.asarray(np.pad(rng.randn(B, L, H, Dh).astype(np.float32),
                              ((0, 0), (hw, hw), (0, 0), (0, 0))))
    vpad = jnp.asarray(np.pad(rng.randn(B, L, H, Dh).astype(np.float32),
                              ((0, 0), (hw, hw), (0, 0), (0, 0))))
    rel = jnp.asarray((rng.randn(H, Dh, W) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32))
    return q, kpad, vpad, rel, g


@pytest.mark.parametrize("L,W,block", [(100, 31, 64), (64, 7, 64),
                                       (130, 31, 128)])
def test_pallas_backward_matches_xla_vjp(L, W, block):
    q, kpad, vpad, rel, g = _setup(L=L, W=W)

    def ref_fn(q_, k_, v_, r_):
        out, _ = banded_attention(q_, k_, v_, r_, W, 64,
                                  return_probs=False)
        return out

    _, vjp = jax.vjp(ref_fn, q, kpad, vpad, rel)
    expect = vjp(g)
    got = pallas_banded_backward(q, kpad, vpad, rel, g, W, block)
    for name, a, b in zip(("dq", "dk", "dv", "drel"), got, expect):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=1e-4, atol=3e-6, err_msg=name)


def test_flag_gated_custom_vjp(monkeypatch):
    from reconvat_tpu.nn.attention import banded_attention_pallas

    monkeypatch.setenv("RECONVAT_PALLAS_BWD", "1")
    q, kpad, vpad, rel, g = _setup(L=64, W=7)

    def loss_pallas(q, k, v, r):
        return jnp.sum(banded_attention_pallas(q, k, v, r, 7, 64) * g)

    def loss_xla(q, k, v, r):
        out, _ = banded_attention(q, k, v, r, 7, 64, return_probs=False)
        return jnp.sum(out * g)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, kpad, vpad, rel)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, kpad, vpad, rel)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pallas_bwd", [False, True])
def test_custom_vjp_bf16_grads(monkeypatch, pallas_bwd):
    """Regression: the custom_vjp primal output must carry the operand
    dtype, or the bf16 mixed-precision cotangent mismatches the XLA
    fallback backward (caught on the flagship bf16 VAT train step)."""
    from reconvat_tpu.nn.attention import banded_attention_pallas

    # "0" forces the XLA-VJP backward: with the flag unset, bf16 inputs
    # default to the Pallas backward (the measured train-step winner).
    monkeypatch.setenv("RECONVAT_PALLAS_BWD", "1" if pallas_bwd else "0")
    q, kpad, vpad, rel, g = _setup(L=64, W=7)
    q, kpad, vpad, rel = (x.astype(jnp.bfloat16)
                          for x in (q, kpad, vpad, rel))

    def loss(q, k, v, r):
        out = banded_attention_pallas(q, k, v, r, 7, 64)
        assert out.dtype == jnp.bfloat16
        return jnp.sum(out.astype(jnp.float32) * g)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, kpad, vpad, rel)
    for name, a in zip(("dq", "dk", "dv", "drel"), grads):
        assert a.dtype == jnp.bfloat16, name
        assert bool(jnp.all(jnp.isfinite(a.astype(jnp.float32)))), name


def test_backward_selection_flag(monkeypatch):
    """Default backward is the XLA VJP (measured parity on the resident-
    input train step); RECONVAT_PALLAS_BWD=1 forces the Pallas kernel,
    "0" and unset force XLA."""
    from reconvat_tpu.nn.attention import _use_pallas_bwd

    monkeypatch.delenv("RECONVAT_PALLAS_BWD", raising=False)
    assert not _use_pallas_bwd()
    monkeypatch.setenv("RECONVAT_PALLAS_BWD", "0")
    assert not _use_pallas_bwd()
    monkeypatch.setenv("RECONVAT_PALLAS_BWD", "1")
    assert _use_pallas_bwd()


def test_auto_impl_resolution():
    """'auto' resolves to the XLA banded formulation everywhere (measured
    winner under the folded layout, see resolve_attn_impl)."""
    from reconvat_tpu.nn.attention import resolve_attn_impl

    assert resolve_attn_impl("auto") == "xla"
    assert resolve_attn_impl("pallas") == "pallas"
    assert resolve_attn_impl("xla") == "xla"


@pytest.mark.slow
def test_vat_train_step_with_pallas_bwd(monkeypatch):
    """Regression: the outer train-step grad linearizes the VAT inner
    gradient, whose primal pass contains the Pallas backward kernel — the
    kernel must be custom_jvp-differentiable (JVP via the XLA
    formulation) or the flagship VAT step fails to trace."""
    monkeypatch.setenv("RECONVAT_PALLAS_BWD", "1")
    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.train.state import create_train_state, make_train_step

    frames = 32
    rng = np.random.RandomState(0)
    batch = {
        "audio": (rng.randn(2, frames * 512) * 0.1).astype(np.float32),
        "onset": (rng.rand(2, frames, 88) > 0.97).astype(np.float32),
        "offset": (rng.rand(2, frames, 88) > 0.97).astype(np.float32),
        "frame": (rng.rand(2, frames, 88) > 0.9).astype(np.float32),
        "velocity": rng.rand(2, frames, 88).astype(np.float32),
    }
    model = ReconVAT(reconstruction=True, attn_impl="pallas",
                     compute_dtype="bfloat16")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               seq_frames=frames)
    step = make_train_step(model, alpha=1.0, vat=True, use_unlabeled=False)
    state, losses = step(state, batch, None, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
