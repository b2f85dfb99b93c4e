"""Decompose the banded-attention backward cost: kernel vs XLA glue.

    python tools/bench_attention_parts.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from reconvat_tpu import runtime
from reconvat_tpu.ops.pallas_attention import pallas_banded_forward
from reconvat_tpu.ops.pallas_attention_bwd import pallas_banded_backward

runtime.setup()

B, L, H, Dh, W = 8, 640, 4, 229, 31
hw = (W - 1) // 2

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32) * 0.1
kpad = jnp.asarray(rng.randn(B, L + 2 * hw, H, Dh), jnp.float32) * 0.1
vpad = jnp.asarray(rng.randn(B, L + 2 * hw, H, Dh), jnp.float32) * 0.1
rel = jnp.asarray(rng.randn(H, Dh, W), jnp.float32) * 0.1
g_out = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32) * 0.1


def timeit(name, fn, *xs, iters=100):
    f = jax.jit(fn)
    out = f(*xs)
    jax.block_until_ready(out)
    for _ in range(5):
        jax.block_until_ready(f(*xs))
    # async-pipelined measurement
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*xs)
    jax.block_until_ready(out)
    asyn = (time.perf_counter() - t0) / iters * 1e3
    # per-call blocked measurement (includes dispatch latency)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(f(*xs))
    blk = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:>28s}: pipelined {asyn:8.3f} ms   blocked {blk:8.3f} ms")
    return asyn


print("device:", jax.devices()[0].device_kind)

timeit("pallas_fwd", lambda *a: pallas_banded_forward(*a, W, 256),
       q, kpad, vpad, rel)
timeit("pallas_bwd(full)",
       lambda *a: pallas_banded_backward(*a[:4], a[4], W, 256),
       q, kpad, vpad, rel, g_out)


# kernel-only: rerun the bwd but skip the XLA overlap-add/unfold glue by
# returning the raw pallas outputs
import reconvat_tpu.ops.pallas_attention_bwd as bwd_mod
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from reconvat_tpu.ops.pallas_attention import _round_up, _use_interpret


def bwd_kernel_only(q, kpad, vpad, rel, d_out):
    B, L, H, Dh = q.shape
    window = W
    block = 256
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
    relf = jnp.pad(rel.astype(dtype), ((0, 0), (0, Dp - Dh),
                                       (0, Wp - window)))
    precision = jax.lax.Precision.HIGHEST
    kernel = functools.partial(bwd_mod._bwd_kernel, block=block,
                               window=window, ctx_pad=ctx_pad,
                               precision=precision)
    G = B * H
    return pl.pallas_call(
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


timeit("pallas_bwd kernel-only", bwd_kernel_only, q, kpad, vpad, rel, g_out)
