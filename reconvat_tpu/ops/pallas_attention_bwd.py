"""Pallas TPU kernel: banded local attention backward.

Rematerializes the forward (scores -> skewed band bias -> softmax) in VMEM
and produces all four gradients in one fused program per
(batch*head, block):

    dP      = dO @ Vc^T
    dS      = P * (dP - rowsum(dP * P))        (softmax backward)
    dQ_blk  = dS @ Kc + unskew(dS) @ rel^T
    dK[ctx] += dS^T @ Q_blk                     (accumulated in a VMEM
    dV[ctx] += P^T  @ dO_blk                     output block revisited
    dRel    += Q_blk^T @ unskew(dS)              across the i grid dim)

Neighbouring context blocks overlap by window-1 frames; because the i grid
dimension is innermost (sequential on the core), dK/dV/dRel accumulate
in-place in VMEM across the revisited output block — no HBM partials, no
XLA overlap-add. Band<->offset layout changes use the strided rotate
(`pltpu.roll`) and anti-identity MXU flips, not per-offset select loops.
Heads live in the lane dimension (see pallas_attention.py) so the wrapper
does no transposes. Enabled via MultiHeadAttention1D's custom VJP when
RECONVAT_PALLAS_BWD=1 (default backward differentiates the XLA
formulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import (_flatten_heads, _round_up, _skew_bias,
                               _use_interpret)


def _bwd_kernel(q_ref, do_ref, k_hbm, v_hbm, rel_ref,
                dq_ref, dk_ref, dv_ref, drel_ref,
                k_vmem, v_vmem, sems, *,
                block: int, window: int, ctx_pad: int, n_heads: int,
                dp: int, precision):
    g = pl.program_id(0)
    i = pl.program_id(1)
    b = g // n_heads
    h = g % n_heads
    start = pl.multiple_of(i * block, block)
    lane0 = pl.multiple_of(h * dp, dp)

    copy_k = pltpu.make_async_copy(
        k_hbm.at[b, pl.ds(start, ctx_pad), pl.ds(lane0, dp)], k_vmem,
        sems.at[0])
    copy_v = pltpu.make_async_copy(
        v_hbm.at[b, pl.ds(start, ctx_pad), pl.ds(lane0, dp)], v_vmem,
        sems.at[1])
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
    bias = _skew_bias(qrel, block, ctx_pad)
    scores = jnp.where(in_band, scores + bias, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)            # (block, ctx_pad)

    copy_v.wait()
    v = v_vmem[:]
    dp_mat = jax.lax.dot_general(do, v, dims_tt,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)     # (block, ctx_pad)
    ds = p * (dp_mat - jnp.sum(dp_mat * p, axis=-1, keepdims=True))

    # band-collapse: dqrel[q, j] = ds[q, q + j] — the inverse skew. Mosaic's
    # strided rotate only supports small non-negative strides (a stride of
    # ctx_pad-1, i.e. "-1", exceeds the per-vreg shift limit), so
    # rotate-left-by-row is expressed as flip0 . rotate-right-by-row . flip0
    # with the row flips as anti-identity MXU matmuls (lax.rev has no Mosaic
    # lowering). With shift ctx_pad + 1 - block the band lands in lanes
    # [0, window).
    wp = rel.shape[1]
    r2 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    jmat = (r2 + c2 == block - 1).astype(jnp.float32)   # anti-identity
    ds_f = jax.lax.dot_general(jmat, ds, dims_nt,
                               preferred_element_type=jnp.float32,
                               precision=precision)
    z = pltpu.roll(ds_f, shift=(ctx_pad + 1 - block) % ctx_pad, axis=1,
                   stride=1, stride_axis=0)
    dqrel = jax.lax.dot_general(jmat, z[:, :wp], dims_nt,
                                preferred_element_type=jnp.float32,
                                precision=precision)
    jcols = jax.lax.broadcasted_iota(jnp.int32, (block, wp), 1)
    dqrel = jnp.where(jcols < window, dqrel, 0.0)

    dsq = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(dsq, k, dims_nt,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)
                 + jax.lax.dot_general(dqrel.astype(rel.dtype), rel,
                                       dims_tt,
                                       preferred_element_type=jnp.float32,
                                       precision=precision))

    dk_blk = jax.lax.dot_general(dsq, q, dims_tn,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)     # (ctx_pad, Dp)
    dv_blk = jax.lax.dot_general(p.astype(do.dtype), do, dims_tn,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
    drel_blk = jax.lax.dot_general(q, dqrel.astype(q.dtype), dims_tn,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)   # (Dp, Wp)

    # accumulate into the VMEM-resident revisited output blocks; i is the
    # innermost grid dim so revisits are consecutive and stay in VMEM
    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        drel_ref[0] = jnp.zeros_like(drel_ref[0])

    dk_ref[0, pl.ds(start, ctx_pad), :] += dk_blk
    dv_ref[0, pl.ds(start, ctx_pad), :] += dv_blk
    drel_ref[0] += drel_blk


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6))
def pallas_banded_backward(q, kpad, vpad, rel, d_out, window: int,
                           block: int = 256):
    """Gradients of pallas_banded_forward w.r.t. (q, kpad, vpad, rel).

    Differentiable: under VAT the power-iteration gradient is itself part
    of the traced train step, so the outer `jax.grad` linearizes this
    function. Its JVP (below) runs through the XLA formulation — the VAT
    direction is stop-gradiented (`vat.py`), so XLA dead-code-eliminates
    that tangent path; it exists for correctness, not speed.
    """
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

    qf = _flatten_heads(q, Lp, Dh, Dp, dtype)
    dof = _flatten_heads(d_out, Lp, Dh, Dp, dtype)
    kf = _flatten_heads(kpad, ktail, Dh, Dp, dtype)
    vf = _flatten_heads(vpad, ktail, Dh, Dp, dtype)
    had_rel = rel is not None
    if rel is None:
        relf = jnp.zeros((H, Dp, Wp), dtype)
    else:
        relf = jnp.pad(rel.astype(dtype),
                       ((0, 0), (0, Dp - Dh), (0, Wp - window)))

    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_bwd_kernel, block=block, window=window,
                               ctx_pad=ctx_pad, n_heads=H, dp=Dp,
                               precision=precision)

    G = B * H
    dq, dk_full, dv_full, drel_g = pl.pallas_call(
        kernel,
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((1, block, Dp), lambda g, i, H=H: (g // H, i, g % H),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, Dp), lambda g, i, H=H: (g // H, i, g % H),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, Dp, Wp), lambda g, i, H=H: (g % H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, Dp),
                         lambda g, i, H=H: (g // H, i, g % H),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ktail, Dp),
                         lambda g, i, H=H: (g // H, 0, g % H),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ktail, Dp),
                         lambda g, i, H=H: (g // H, 0, g % H),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, Wp), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lp, H * Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, ktail, H * Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, ktail, H * Dp), jnp.float32),
            jax.ShapeDtypeStruct((G, Dp, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(qf, dof, kf, vf, relf)

    def unflatten(x, orig_len):
        x = x.reshape(B, x.shape[1], H, Dp)
        return x[:, :orig_len, :, :Dh].astype(q.dtype)

    dq_out = unflatten(dq, L)
    dk_out = unflatten(dk_full, L + 2 * hw)
    dv_out = unflatten(dv_full, L + 2 * hw)

    drel = jnp.sum(drel_g.reshape(B, H, Dp, Wp), axis=0)
    drel_out = drel[:, :Dh, :window].astype(rel.dtype) if had_rel else None
    return dq_out, dk_out, dv_out, drel_out


@pallas_banded_backward.defjvp
def _pallas_banded_backward_jvp(window, block, primals, tangents):
    from ..nn.attention import banded_attention

    q, kpad, vpad, rel, d_out = primals
    tq, tk, tv, trel, tg = tangents
    had_rel = rel is not None
    if rel is None:
        H, Dh = q.shape[2], q.shape[3]
        rel = jnp.zeros((H, Dh, window), q.dtype)
        trel = jnp.zeros_like(rel)

    out_primal = pallas_banded_backward(q, kpad, vpad, rel, d_out, window,
                                        block)

    def xla_backward(q_, k_, v_, r_, g_):
        def f(a, b, c, d):
            out, _ = banded_attention(a, b, c, d, window,
                                      block_size=min(block, 128),
                                      return_probs=False)
            return out

        _, vjp = jax.vjp(f, q_, k_, v_, r_)
        return vjp(g_.astype(q_.dtype))

    _, out_tangent = jax.jvp(xla_backward, (q, kpad, vpad, rel, d_out),
                             (tq, tk, tv, trel, tg))
    if not had_rel:
        out_primal = out_primal[:3] + (None,)
        out_tangent = out_tangent[:3] + (None,)
    return out_primal, out_tangent
