"""Validate the frequency-folded conv reformulation on TPU.

The optimized train-step HLO shows full-resolution U-Net tensors laid out
as bf16[8,640,229,16]{3,0,2,1:T(8,128)(2,1)}: the 16-channel minor dim is
padded to 128 lanes (8x) and the batch sublane dim to 16 (2x) — a ~16x
HBM byte blowup that makes the level-1 convs the dominant cost of the
train step (tools/hlo_bytes.py).

This tool measures a representative level-1 encoder block (conv1 -> BN ->
lrelu -> conv2 -> BN -> lrelu -> +skip) in two formulations:
  - nhwc:   plain (B, T, F=229, C=16) convs (the current layout)
  - folded: (B, T, F/k=29, k*C=128) with the 3x3 kernels scattered into
            folded (3, 3, 128, 128) kernels — 8x the MACs, ~1/8 the bytes

and checks numerical parity between them.

    python tools/bench_folded_conv.py [--iters 30] [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fold_kernel_3x3(k_logical, fold):
    """(3, 3, Ci, Co) -> (3, 3, fold*Ci, fold*Co) folded-frequency kernel.

    Folded channel index = jj * C + c (jj = position inside the fold
    block). Output position jj with freq tap df reads input position
    jj + df - 1, which lands in folded block offset dj with intra-block
    position jjp: jj + df - 1 = dj * fold + jjp.
    """
    import jax.numpy as jnp

    ci, co = k_logical.shape[2], k_logical.shape[3]
    kf = jnp.zeros((3, 3, fold * ci, fold * co), k_logical.dtype)
    for jj in range(fold):
        for df in range(3):
            dj, jjp = divmod(jj + df - 1, fold)
            kf = kf.at[:, dj + 1,
                       jjp * ci:(jjp + 1) * ci,
                       jj * co:(jj + 1) * co].set(k_logical[:, df])
    return kf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--bins", type=int, default=229)
    ap.add_argument("--ch", type=int, default=16)
    ap.add_argument("--fold", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from reconvat_tpu import runtime
    runtime.setup()

    B, T, F, C, k = (args.batch, args.frames, args.bins, args.ch, args.fold)
    Fp = -(-F // k) * k          # F padded to a fold multiple
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.randn(B, T, F, C), dt)
    w1 = jnp.asarray(rng.randn(3, 3, C, C) * 0.1, dt)
    w2 = jnp.asarray(rng.randn(3, 3, C, C) * 0.1, dt)
    ws = jnp.asarray(rng.randn(1, 1, C, C) * 0.1, dt)

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def block_nhwc(x, w1, w2, ws):
        y = jax.lax.conv_general_dilated(x, w1, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        y = jax.nn.leaky_relu(y)
        y = jax.lax.conv_general_dilated(y, w2, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        y = jax.nn.leaky_relu(y)
        s = jax.lax.conv_general_dilated(x, ws, (1, 1), [(0, 0), (0, 0)],
                                         dimension_numbers=dn)
        return y + s

    # folded: (B, T, Fp/k, k*C); channel index = jj * C + c
    def fold(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, Fp - F), (0, 0)))
        return xp.reshape(B, T, Fp // k, k * C)

    def unfold(xf):
        return xf.reshape(B, T, Fp, C)[:, :, :F]

    w1f = fold_kernel_3x3(w1, k)
    w2f = fold_kernel_3x3(w2, k)
    # 1x1 skip: block-diagonal folded kernel, position-preserving
    wsf = jnp.zeros((1, 1, k * C, k * C), dt)
    for jj in range(k):
        wsf = wsf.at[:, :, jj * C:(jj + 1) * C, jj * C:(jj + 1) * C].set(ws)

    # mask killing the Fp-F padded bins (they must stay zero so the 3x3
    # taps that read them see the original conv zero-padding)
    m = np.zeros((Fp // k, k, 1), np.float32)
    m.reshape(Fp, 1)[:F] = 1.0
    mask = jnp.asarray(m.reshape(1, 1, Fp // k, k, 1)
                       * np.ones((1, 1, 1, 1, C), np.float32),
                       dt).reshape(1, 1, Fp // k, k * C)

    @jax.jit
    def block_folded(xf, w1f, w2f, wsf):
        y = jax.lax.conv_general_dilated(xf, w1f, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        y = jax.nn.leaky_relu(y) * mask
        y = jax.lax.conv_general_dilated(y, w2f, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        y = jax.nn.leaky_relu(y)
        s = jax.lax.conv_general_dilated(xf, wsf, (1, 1), [(0, 0), (0, 0)],
                                         dimension_numbers=dn)
        return (y + s) * mask

    xf = fold(x)

    ref = np.asarray(block_nhwc(x, w1, w2, ws), np.float32)
    got = np.asarray(unfold(block_folded(xf, w1f, w2f, wsf)), np.float32)
    err = np.max(np.abs(ref - got)) / max(1e-9, np.max(np.abs(ref)))
    print(f"parity rel-max-err: {err:.2e}")

    for name, fn, inp, wargs in (
            ("nhwc", block_nhwc, x, (w1, w2, ws)),
            ("folded", block_folded, xf, (w1f, w2f, wsf))):
        c = fn.lower(inp, *wargs).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fn(inp, *wargs).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(inp, *wargs)
        out.block_until_ready()
        dt_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:8s}: {dt_ms:8.3f} ms/iter   "
              f"{ca.get('flops', 0) / 1e9:7.2f} GFLOP   "
              f"{ca.get('bytes accessed', 0) / 1e9:6.2f} GB accessed")


if __name__ == "__main__":
    main()
