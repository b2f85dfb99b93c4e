"""Pallas TPU kernel: banded local attention backward.

Rematerializes the forward (scores -> band bias -> softmax) in VMEM and
produces all four gradients in one fused program per (batch*head, block):

    dP      = dO @ Vc^T
    dS      = P * (dP - rowsum(dP * P))        (softmax backward)
    dQ_blk  = dS @ Kc + band_collapse(dS) @ rel^T
    dKc_blk = dS^T @ Q_blk                      (per-block, overlap-added
    dVc_blk = P^T  @ dO_blk                      outside the kernel)
    dRel    = Q_blk^T @ band_collapse(dS)       (summed outside)

Because neighbouring context blocks overlap by window-1 frames, dK/dV come
out as per-block partials; the cheap overlap-add back onto the padded
sequence happens in XLA. Enabled via MultiHeadAttention1D's custom VJP when
RECONVAT_PALLAS_BWD=1 (default backward differentiates the XLA
formulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import _round_up, _use_interpret


def _bwd_kernel(q_ref, do_ref, k_hbm, v_hbm, rel_ref,
                dq_ref, dk_ref, dv_ref, drel_ref,
                k_vmem, v_vmem, sems, *,
                block: int, window: int, ctx_pad: int, precision):
    g = pl.program_id(0)
    i = pl.program_id(1)
    start = pl.multiple_of(i * block, block)

    copy_k = pltpu.make_async_copy(
        k_hbm.at[g, pl.ds(start, ctx_pad), :], k_vmem, sems.at[0])
    copy_v = pltpu.make_async_copy(
        v_hbm.at[g, pl.ds(start, ctx_pad), :], v_vmem, sems.at[1])
    copy_k.start()
    copy_v.start()

    q = q_ref[0]
    do = do_ref[0]
    rel = rel_ref[0]
    dims_nt = (((1,), (0,)), ((), ()))   # (a, b) -> a @ b
    dims_tt = (((1,), (1,)), ((), ()))   # (a, b) -> a @ b^T
    dims_tn = (((0,), (0,)), ((), ()))   # (a, b) -> a^T @ b

    qrel = jax.lax.dot_general(q, rel, dims_nt,
                               preferred_element_type=jnp.float32,
                               precision=precision)       # (block, Wp)

    rows = jax.lax.broadcasted_iota(jnp.int32, (block, ctx_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, ctx_pad), 1)
    offs = cols - rows
    in_band = (offs >= 0) & (offs < window)

    copy_k.wait()
    k = k_vmem[:]
    scores = jax.lax.dot_general(q, k, dims_tt,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)     # (block, ctx_pad)
    bias = jnp.zeros((block, ctx_pad), jnp.float32)
    for j in range(window):
        bias = bias + jnp.where(offs == j, qrel[:, j:j + 1], 0.0)
    scores = jnp.where(in_band, scores + bias, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)            # (block, ctx_pad)

    copy_v.wait()
    v = v_vmem[:]
    dp = jax.lax.dot_general(do, v, dims_tt,
                             preferred_element_type=jnp.float32,
                             precision=precision)         # (block, ctx_pad)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    # band-collapse: dqrel[q, j] = ds[q, q + j]
    dqrel_cols = []
    for j in range(window):
        dqrel_cols.append(jnp.sum(jnp.where(offs == j, ds, 0.0), axis=1,
                                  keepdims=True))
    wp = rel.shape[1]
    dqrel = jnp.concatenate(
        dqrel_cols + [jnp.zeros((block, wp - window), jnp.float32)], axis=1)

    dsq = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(dsq, k, dims_nt,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)
                 + jax.lax.dot_general(dqrel.astype(rel.dtype), rel,
                                       dims_tt,
                                       preferred_element_type=jnp.float32,
                                       precision=precision))
    dk_ref[0, 0] = jax.lax.dot_general(dsq, q, dims_tn,
                                       preferred_element_type=jnp.float32,
                                       precision=precision)
    dv_ref[0, 0] = jax.lax.dot_general(p.astype(do.dtype), do, dims_tn,
                                       preferred_element_type=jnp.float32,
                                       precision=precision)
    drel_ref[0, 0] = jax.lax.dot_general(q, dqrel.astype(q.dtype), dims_tn,
                                         preferred_element_type=jnp.float32,
                                         precision=precision)


def pallas_banded_backward(q, kpad, vpad, rel, d_out, window: int,
                           block: int = 256):
    """Gradients of pallas_banded_forward w.r.t. (q, kpad, vpad, rel)."""
    B, L, H, Dh = q.shape
    hw = (window - 1) // 2
    block = min(block, _round_up(max(L, 8), 8))
    nb = -(-L // block)
    Lp = nb * block
    Dp = _round_up(Dh, 128)
    Wp = _round_up(window, 128)
    ctx = block + 2 * hw
    ctx_pad = _round_up(ctx, 128)
    ktail = Lp + 2 * hw + (ctx_pad - ctx)
    dtype = q.dtype

    def fold(x, length):
        x = jnp.pad(x, ((0, 0), (0, length - x.shape[1]), (0, 0),
                        (0, Dp - Dh)))
        return (x.transpose(0, 2, 1, 3).reshape(B * H, length, Dp)
                .astype(dtype))

    qf = fold(q, Lp)
    dof = fold(d_out, Lp)
    kf = fold(kpad, ktail)
    vf = fold(vpad, ktail)
    had_rel = rel is not None
    if rel is None:
        relf = jnp.zeros((H, Dp, Wp), dtype)
    else:
        relf = jnp.pad(rel.astype(dtype),
                       ((0, 0), (0, Dp - Dh), (0, Wp - window)))

    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_bwd_kernel, block=block, window=window,
                               ctx_pad=ctx_pad, precision=precision)

    G = B * H
    dq, dk_parts, dv_parts, drel_parts = pl.pallas_call(
        kernel,
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((1, block, Dp), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, Dp), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, Dp, Wp), lambda g, i: (g % H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, Dp), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ctx_pad, Dp), lambda g, i: (g, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ctx_pad, Dp), lambda g, i: (g, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dp, Wp), lambda g, i: (g, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((G, nb, ctx_pad, Dp), jnp.float32),
            jax.ShapeDtypeStruct((G, nb, ctx_pad, Dp), jnp.float32),
            jax.ShapeDtypeStruct((G, nb, Dp, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(qf, dof, kf, vf, relf)

    # overlap-add the per-block context gradients back onto the padded
    # sequence (neighbouring context windows share window-1 frames)
    def unfold_ctx(parts):
        acc = jnp.zeros((G, ktail, Dp), jnp.float32)
        for i in range(nb):
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(
                    acc, (0, i * block, 0), (G, ctx_pad, Dp))
                + parts[:, i], (0, i * block, 0))
        return acc

    dk_full = unfold_ctx(dk_parts)
    dv_full = unfold_ctx(dv_parts)

    def unfold(x, length, orig_len):
        x = x.reshape(B, H, length, Dp).transpose(0, 2, 1, 3)
        return x[:, :orig_len, :, :Dh].astype(q.dtype)

    dq_out = unfold(dq, Lp, L)
    dk_out = unfold(dk_full, ktail, L + 2 * hw)
    dv_out = unfold(dv_full, ktail, L + 2 * hw)

    drel = jnp.sum(drel_parts.reshape(B, H, nb, Dp, Wp), axis=(0, 2))
    drel_out = drel[:, :Dh, :window].astype(rel.dtype) if had_rel else None
    return dq_out, dk_out, dv_out, drel_out
