"""Loss-gradient parity vs torch, including saturation extremes.

Regression for the TPU NaN: the naive BCE backward (t/p) overflows fp32
once a confidently-wrong sigmoid saturates below ~3e-39; torch's
F.binary_cross_entropy clamps the derivative denominator at 1e-12
(see models/losses._bce_elem). These tests pin our gradients to torch's
at every regime, and second-order usability through the VAT structure.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models.losses import binary_cross_entropy


def _cases():
    rng = np.random.RandomState(0)
    p = np.concatenate([
        rng.rand(64).astype(np.float32),
        np.array([0.0, 1.0, 1e-45, 1e-40, 1e-38, 1e-12, 1e-7,
                  1 - 1e-7, np.float32(1 - 6e-8)], np.float32),
    ])
    t = (rng.rand(len(p)) > 0.5).astype(np.float32)
    return p, t


def test_bce_grad_matches_torch_at_saturation():
    torch = pytest.importorskip("torch")
    p, t = _cases()

    pt = torch.tensor(p, requires_grad=True)
    loss_ref = torch.nn.functional.binary_cross_entropy(pt, torch.tensor(t))
    loss_ref.backward()

    loss = binary_cross_entropy(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(float(loss), float(loss_ref.detach()),
                               rtol=1e-5)

    g = jax.grad(lambda q: binary_cross_entropy(q, jnp.asarray(t)))(
        jnp.asarray(p))
    gj, gt = np.asarray(g), pt.grad.numpy()
    assert np.isfinite(gj).all()
    np.testing.assert_allclose(gj, gt, rtol=1e-4, atol=1e-7)


def test_bce_grad_bounded_in_overflow_window():
    """p in (e^-100, ~3e-39): naive t/p would be inf; torch clamp caps the
    per-element derivative at |p - t| * 1e12."""
    p = jnp.asarray([1e-40, 1e-42, 2e-39], jnp.float32)
    t = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    g = jax.grad(lambda q: jnp.sum(
        binary_cross_entropy(q, t) * q.size))(p)  # undo the mean
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (np.abs(g) <= 1.0001e12).all()


def test_bce_second_order_traces():
    """grad-of-grad through the custom_jvp BCE (the VAT power iteration's
    inner gradient lives inside the outer train-step grad)."""
    t = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)

    def inner(x):
        p = jax.nn.sigmoid(x)
        g = jax.grad(lambda q: binary_cross_entropy(
            jax.nn.sigmoid(q), t))(x)
        # use the (stop-gradiented) inner grad like VAT uses d
        r = jax.lax.stop_gradient(g)
        return binary_cross_entropy(jax.nn.sigmoid(x + r), t) + 0.0 * p.sum()

    gg = jax.grad(inner)(jnp.asarray([0.3, -0.2, 2.0], jnp.float32))
    assert np.isfinite(np.asarray(gg)).all()
