"""Virtual Adversarial Training as a single jit-compatible transform.

One generic function covers the reference's whole VAT family
(`model/VAT.py:9-43`, `model/self_attention_VAT.py:101-238`,
`model/UNet_onset.py:101-162`, `model/onset_frame_VAT.py:158-311`,
`model/Segmentation.py:22-77`): power iteration for the adversarial
direction in spectrogram space via `jax.grad` w.r.t. the input, a
`stop_gradient` reference label, clamp(0, 1) on perturbed inputs, and an
optional 1e10 gradient rescue against fp32 underflow (reference
`model/UNet_onset.py:141`).

TPU note: the whole procedure traces into the jitted train step, so VAT
costs exactly its extra forward/backward passes — no host round trips.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp

from .models.losses import binary_cross_entropy, binary_kl_div


@dataclasses.dataclass(frozen=True)
class VATConfig:
    xi: float = 1e-6
    eps: float = 2.0
    n_power: int = 1
    kl_div: bool = False
    binwise: bool = False
    grad_rescue: float = 1e10   # d * 1e10 underflow rescue (UNet variants)
    norm_axis: int = -1         # axis of the per-vector L2 norm
    clamp: bool = True          # clamp perturbed input to [0, 1]
    # optional custom objective: (y_pred_tree, y_ref_tree) ->
    # (total, loss_tree); overrides the BCE/KL default (used by the
    # frame-stack variant's activation-MSE mode,
    # reference `model/onset_frame_VAT.py:232-240`)
    objective: Callable | None = None


def l2_normalize(d, binwise: bool = False, axis: int = -1):
    """Reference `_l2_normalize` (`model/self_attention_VAT.py:240-246`).

    Documented divergence: the reference's vector mode divides by an
    unguarded norm, so a fully-saturated model (adversarial gradient
    underflows to exactly 0 even after the 1e10 rescue) turns the whole
    step NaN — its own NaN assert (`model/UNet_onset.py:146`) would abort
    there. We floor the norm at 1e-30 (fp32 min normal is ~1e-38), which
    is bit-identical for every non-degenerate direction and yields a zero
    perturbation instead of NaN in the degenerate case. Observed on a
    supersmall overfit run that saturated frame BCE below 2e-2.
    """
    if binwise:
        return d / (jnp.abs(d) + 1e-8)
    norm = jnp.linalg.norm(d, axis=axis, keepdims=True)
    return d / jnp.maximum(norm, 1e-30)


def _tree_objective(y_pred, y_ref, kl_div: bool):
    """BCE/KL summed over (possibly multi-output) prediction pytrees."""
    obj = binary_kl_div if kl_div else binary_cross_entropy
    losses = jax.tree_util.tree_map(obj, y_pred, y_ref)
    leaves = jax.tree_util.tree_leaves(losses)
    return sum(leaves[1:], leaves[0]), losses


def vat_loss(apply_fn: Callable, x: jnp.ndarray, key: jax.Array,
             cfg: VATConfig, init_d: jnp.ndarray | None = None,
             y_ref=None, split: int | None = None):
    """Returns (vat_loss_tree, r_adv, d_normalized).

    apply_fn(x) -> prediction pytree (array, or dict for frame+onset
    variants). Gradients of the returned loss flow into model parameters
    captured by `apply_fn`; the adversarial direction itself is
    stop-gradiented exactly like the reference's `.detach()`.

    vat_loss_tree has the same structure as apply_fn's output, so the
    UNet_Onset variant's `{'frame':..., 'onset':...}` dict of losses
    (reference `model/UNet_onset.py:160-161`) falls out naturally; for
    single-output models it is a scalar.

    y_ref: optional precomputed clean prediction tree (same structure as
    apply_fn(x)'s output). When the caller has already run the identical
    clean forward — e.g. the supervised pass of the same train step —
    passing it here skips vat_loss's own reference forward; stop_gradient
    is applied either way, so the result is bit-identical.

    split: x is the concatenation of two independent chains along the
    batch axis (`[:split]` labeled, `[split:]` unlabeled) and the returned
    loss tree is the tuple (tree_l, tree_ul), each segment's objective
    computed separately. The power iteration and adversarial forward run
    as single full-batch passes; when apply_fn is per-sample independent
    (frozen BN — see ReconVAT.vat_chain='batched') the scalars are
    identical to two separate vat_loss calls: the only cross-segment
    coupling is the power objective's mean over 2B instead of B, a
    power-of-two rescale of d that the per-vector l2 normalization
    removes exactly.
    """
    if y_ref is None:
        y_ref = apply_fn(x)
    y_ref = jax.tree_util.tree_map(jax.lax.stop_gradient, y_ref)

    def objective_pair(y_pred, y_ref_):
        if cfg.objective is not None:
            return cfg.objective(y_pred, y_ref_)
        return _tree_objective(y_pred, y_ref_, cfg.kl_div)

    if init_d is None:
        d = jax.random.normal(key, x.shape, x.dtype)
    else:
        d = init_d  # deterministic seed direction (tests / reproducibility)

    def objective(y_pred):
        return objective_pair(y_pred, y_ref)

    def perturbed(r):
        xr = x + r
        return jnp.clip(xr, 0.0, 1.0) if cfg.clamp else xr

    def adv_objective(d_var):
        # Differentiate through the normalization, matching the reference's
        # `loss.backward(); d = d.grad` (`model/self_attention_VAT.py:122-130`)
        # — the resulting direction is g projected orthogonal to d.
        r = cfg.xi * l2_normalize(d_var, cfg.binwise, cfg.norm_axis)
        total, _ = objective(apply_fn(perturbed(r)))
        return total

    for _ in range(cfg.n_power):
        grad_d = jax.grad(adv_objective)(d)
        d = jax.lax.stop_gradient(grad_d) * cfg.grad_rescue

    r_adv = cfg.eps * l2_normalize(d, cfg.binwise, cfg.norm_axis)
    adv_fwd = lambda r: apply_fn(perturbed(r))  # noqa: E731
    if os.environ.get("RECONVAT_VAT_REMAT") == "1":
        # Rematerialize the adversarial forward in the outer backward:
        # its activations are recomputed instead of stored, trading one
        # extra forward of FLOPs for the stored-activation HBM traffic
        # and peak memory. Measured on the flagship folded step
        # (bench_logs/r4_step_remat.log): LOSES 65.3 -> 68.7 ms/step bf16
        # and 84.6 -> 90.3 fp32 — the step is not storage-bound enough —
        # so this stays an opt-in knob for memory-constrained configs
        # (longer crops / larger batches), not a default.
        adv_fwd = jax.checkpoint(adv_fwd)
    y_pred = adv_fwd(r_adv)
    if split is None:
        _, loss_tree = objective(y_pred)
        return loss_tree, r_adv, l2_normalize(d, cfg.binwise, cfg.norm_axis)

    def seg(tree, sl):
        return jax.tree_util.tree_map(lambda a: a[sl], tree)

    _, tree_l = objective_pair(seg(y_pred, slice(None, split)),
                               seg(y_ref, slice(None, split)))
    _, tree_ul = objective_pair(seg(y_pred, slice(split, None)),
                                seg(y_ref, slice(split, None)))
    return (tree_l, tree_ul), r_adv, l2_normalize(d, cfg.binwise,
                                                  cfg.norm_axis)
