"""Pallas TPU kernel: fused banded local attention (forward).

The window-31 local attention is the model's signature custom op
(reference `MutliHeadAttention1D`, `model/self_attention.py:6-82`). The XLA
path (nn/attention.py) materializes halo-extended context blocks in HBM and
lets XLA schedule five separate stages; this kernel keeps one
(batch*head, time-block) tile entirely in VMEM: the context K/V slices are
DMA'd in (they overlap between blocks, which BlockSpec tiling cannot
express), then scores = q @ k_ctx^T, the skewed relative-position band bias
(one strided-rotate, `pltpu.roll`), band mask, softmax, and probs @ v_ctx
run back-to-back on the MXU/VPU with no HBM round trips.

Layout: heads live in the lane dimension — (B, T, H*Dp) with each head
padded to a 128-lane multiple. Kernel blocks slice one head's lanes
directly, so the wrapper does no (B,T,H,D) -> (B*H,T,D) transpose; the pad
to Dp and the final slice fuse into the neighbouring XLA ops.

Forward-only: training wraps it in a custom VJP (nn/attention.py) whose
backward either runs the fused Pallas backward (ops/pallas_attention_bwd)
or differentiates the mathematically identical XLA formulation.

Feature/window/context dims are zero-padded to lane multiples; zero
padding is an exact no-op for every dot product involved.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _skew_bias(qrel, block, ctx_pad):
    """bias[q, q + j] = qrel[q, j]: skew row q right by q positions via the
    strided rotate (one data-movement op instead of a window-iteration
    select loop). qrel columns >= window are exactly zero (rel is
    zero-padded to Wp), and block + window - 1 <= ctx_pad guarantees no
    circular wrap onto live columns."""
    wp = qrel.shape[1]
    if ctx_pad > wp:
        qrel_wide = jnp.concatenate(
            [qrel, jnp.zeros((block, ctx_pad - wp), jnp.float32)], axis=1)
    else:
        # ctx_pad >= ctx >= window, so lanes beyond ctx_pad are all zero;
        # Mosaic rejects zero-size concat operands
        qrel_wide = qrel[:, :ctx_pad]
    return pltpu.roll(qrel_wide, shift=0, axis=1, stride=1, stride_axis=0)


def _attention_kernel(q_ref, k_hbm, v_hbm, rel_ref, o_ref,
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
    rel = rel_ref[0]
    qrel = jax.lax.dot_general(
        q, rel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                             # (block, Wp)

    copy_k.wait()
    scores = jax.lax.dot_general(
        q, k_vmem[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                             # (block, ctx_pad)

    rows = jax.lax.broadcasted_iota(jnp.int32, (block, ctx_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, ctx_pad), 1)
    offs = cols - rows
    in_band = (offs >= 0) & (offs < window)

    bias = _skew_bias(qrel, block, ctx_pad)
    scores = jnp.where(in_band, scores + bias, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    copy_v.wait()
    v = v_vmem[:]
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)


def _flatten_heads(x, length, Dh, Dp, dtype):
    """(B, T, H, Dh) -> (B, length, H*Dp): pad time + per-head lanes. The
    reshape is free (contiguous) and the pads fuse into the producer."""
    B, T, H, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, length - T), (0, 0), (0, Dp - Dh)))
    return x.reshape(B, length, H * Dp).astype(dtype)


def pallas_banded_forward(q, kpad, vpad, rel, window: int,
                          block: int = 256):
    """q (B, L, H, Dh); kpad/vpad (B, L + window - 1, H, Dh);
    rel (H, Dh, window) or None -> out (B, L, H, Dh)."""
    B, L, H, Dh = q.shape
    hw = (window - 1) // 2
    block = min(block, _round_up(max(L, 8), 8))
    nb = -(-L // block)
    Lp = nb * block
    Dp = _round_up(Dh, 128)
    Wp = _round_up(window, 128)
    ctx = block + 2 * hw
    ctx_pad = _round_up(ctx, 128)
    ktail = Lp + 2 * hw + (ctx_pad - ctx)   # last block slice stays in range

    dtype = q.dtype  # bf16 in mixed-precision mode; accumulation stays f32

    qf = _flatten_heads(q, Lp, Dh, Dp, dtype)
    kf = _flatten_heads(kpad, ktail, Dh, Dp, dtype)
    vf = _flatten_heads(vpad, ktail, Dh, Dp, dtype)

    if rel is None:
        relf = jnp.zeros((H, Dp, Wp), dtype)
    else:
        relf = jnp.pad(rel.astype(dtype),
                       ((0, 0), (0, Dp - Dh), (0, Wp - window)))

    # fp32 inputs keep exact-parity 3-pass matmuls; bf16 operands use the
    # native MXU path (Mosaic rejects HIGHEST for low-precision lhs)
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_attention_kernel, block=block,
                               window=window, ctx_pad=ctx_pad, n_heads=H,
                               dp=Dp, precision=precision)

    out = pl.pallas_call(
        kernel,
        grid=(B * H, nb),
        in_specs=[
            pl.BlockSpec((1, block, Dp), lambda g, i, H=H: (g // H, i, g % H),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, Dp, Wp), lambda g, i, H=H: (g % H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, Dp),
                               lambda g, i, H=H: (g // H, i, g % H),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, H * Dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(qf, kf, vf, relf)

    out = out.reshape(B, Lp, H, Dp)
    # match the XLA formulation's output dtype (operand dtype): the custom
    # VJP's cotangent must agree with what jax.vjp of the XLA path expects
    # in bf16 mixed-precision mode (accumulation inside the kernel is f32
    # either way)
    return out[:, :L, :, :Dh].astype(q.dtype)


def _use_interpret() -> bool:
    """Interpret mode on CPU backends (tests without TPU hardware)."""
    import os

    if os.environ.get("RECONVAT_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() == "cpu"
