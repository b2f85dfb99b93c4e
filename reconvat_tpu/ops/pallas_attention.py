"""Pallas TPU kernel: fused banded local attention (forward).

The window-31 local attention is the model's signature custom op
(reference `MutliHeadAttention1D`, `model/self_attention.py:6-82`). The XLA
path (nn/attention.py) materializes halo-extended context blocks in HBM and
lets XLA schedule five separate stages; this kernel keeps one
(batch*head, time-block) tile entirely in VMEM: the context K/V slices are
DMA'd in (they overlap between blocks, which BlockSpec tiling cannot
express), then scores = q @ k_ctx^T, relative-position band bias, band
mask, streaming softmax, and probs @ v_ctx run back-to-back on the
MXU/VPU with no HBM round trips.

Forward-only: training wraps it in a custom VJP (nn/attention.py) whose
backward differentiates the mathematically identical XLA formulation.

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


def _attention_kernel(q_ref, k_hbm, v_hbm, rel_ref, o_ref,
                      k_vmem, v_vmem, sems, *,
                      block: int, window: int, ctx_pad: int,
                      precision):
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

    bias = jnp.zeros((block, ctx_pad), jnp.float32)
    for j in range(window):
        bias = bias + jnp.where(offs == j, qrel[:, j:j + 1], 0.0)

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

    def fold(x, length):
        x = jnp.pad(x, ((0, 0), (0, length - x.shape[1]), (0, 0),
                        (0, Dp - Dh)))
        return (x.transpose(0, 2, 1, 3).reshape(B * H, length, Dp)
                .astype(dtype))

    qf = fold(q, Lp)
    kf = fold(kpad, ktail)
    vf = fold(vpad, ktail)

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
                               window=window, ctx_pad=ctx_pad,
                               precision=precision)

    out = pl.pallas_call(
        kernel,
        grid=(B * H, nb),
        in_specs=[
            pl.BlockSpec((1, block, Dp), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, Dp, Wp), lambda g, i: (g % H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, Dp), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, Dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.VMEM((ctx_pad, Dp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(qf, kf, vf, relf)

    out = out.reshape(B, H, Lp, Dp).transpose(0, 2, 1, 3)
    return out[:, :L, :, :Dh]


def _use_interpret() -> bool:
    """Interpret mode on CPU backends (tests without TPU hardware)."""
    import os

    if os.environ.get("RECONVAT_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() == "cpu"
