"""Loss primitives matching torch semantics."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, frame_mask):
    """Mean over the frames selected by frame_mask (bool, (frames,), axis 1
    of x). Equals jnp.mean of the array trimmed to the true frames — used by
    bucketed full-song evaluation so padded frames don't dilute losses."""
    if frame_mask is None:
        return jnp.mean(x)
    m = frame_mask.reshape((1, -1) + (1,) * (x.ndim - 2))
    scale = x.size // frame_mask.size  # batch x trailing dims per frame
    return jnp.sum(jnp.where(m, x, 0.0)) / (jnp.sum(frame_mask) * scale)


@jax.custom_jvp
def _bce_elem(pred, target):
    """Elementwise BCE with torch `F.binary_cross_entropy` semantics in
    BOTH directions: forward logs clamped at -100, derivative
    (pred - target) / max(pred * (1 - pred), 1e-12) — torch's EPSILON
    clamp (aten/src/ATen/native/Loss.cpp) that bounds the gradient at
    1e12. The naive autodiff backward computes t/p, which OVERFLOWS fp32
    (-> inf grad -> global-norm clip scales by 3/inf=0 -> inf*0 = NaN
    params) once a confidently-wrong sigmoid saturates below ~3e-39;
    observed killing a supersmall overfit run on TPU at step ~172 via the
    reconstruction chain's pianoroll2. custom_jvp (not custom_vjp) so the
    VAT power iteration's gradient remains outer-differentiable."""
    logp = jnp.maximum(jnp.log(pred), -100.0)
    log1mp = jnp.maximum(jnp.log(1.0 - pred), -100.0)
    return -(target * logp + (1.0 - target) * log1mp)


@_bce_elem.defjvp
def _bce_elem_jvp(primals, tangents):
    pred, target = primals
    d_pred, d_target = tangents
    out = _bce_elem(pred, target)
    denom = jnp.maximum(pred * (1.0 - pred), 1e-12)
    logp = jnp.maximum(jnp.log(pred), -100.0)
    log1mp = jnp.maximum(jnp.log(1.0 - pred), -100.0)
    tangent = ((pred - target) / denom * d_pred
               + (log1mp - logp) * d_target)
    return out, tangent


def binary_cross_entropy(pred, target, frame_mask=None):
    """Mean BCE on probabilities; forward AND backward match torch
    `F.binary_cross_entropy` exactly (see _bce_elem)."""
    return _masked_mean(_bce_elem(pred, target), frame_mask)


def mse_loss(pred, target, frame_mask=None):
    return _masked_mean((pred - target) ** 2, frame_mask)


def binary_kl_div(y_pred, y_ref):
    """Per-bin Bernoulli KL(q_pred || p_ref), torch `reduction='batchmean'`
    semantics (sum / batch). Reference `model/self_attention_VAT.py:248-255`."""
    y_pred = jnp.clip(y_pred, 1e-4, 0.9999)
    y_ref = jnp.clip(y_ref, 1e-4, 0.9999)
    q = jnp.stack((y_pred, 1 - y_pred), -1)
    p = jnp.stack((y_ref, 1 - y_ref), -1)
    kl = q * (jnp.log(q) - jnp.log(p))
    return jnp.sum(kl) / y_pred.shape[0]
