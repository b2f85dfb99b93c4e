"""Microbenchmark: banded local attention fwd / fwd+bwd, XLA vs Pallas.

Measures the flagship attention shape (reference `MutliHeadAttention1D`
229->916, window 31, 4 heads at B=8, L=640 — `model/self_attention.py:6`)
on the real TPU chip. Used to decide the default attention impl
(VERDICT round 1, item 6).

    python tools/bench_attention.py [--dtype bf16|f32] [--iters 50]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--L", type=int, default=640)
    ap.add_argument("--H", type=int, default=4)
    ap.add_argument("--Dh", type=int, default=229)
    ap.add_argument("--window", type=int, default=31)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from reconvat_tpu import runtime
    from reconvat_tpu.nn.attention import banded_attention
    from reconvat_tpu.ops.pallas_attention import pallas_banded_forward

    runtime.setup()

    B, L, H, Dh, W = args.B, args.L, args.H, args.Dh, args.window
    hw = (W - 1) // 2
    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, Dh), dtype) * 0.1
    kpad = jnp.asarray(rng.randn(B, L + 2 * hw, H, Dh), dtype) * 0.1
    vpad = jnp.asarray(rng.randn(B, L + 2 * hw, H, Dh), dtype) * 0.1
    rel = jnp.asarray(rng.randn(H, Dh, W), dtype) * 0.1
    g_out = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32) * 0.1

    def timeit(fn, *xs, iters=args.iters, warmup=3):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        for _ in range(warmup):
            jax.block_until_ready(f(*xs))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    def xla_fwd(q, k, v, r):
        out, _ = banded_attention(q, k, v, r, W, block_size=128,
                                  return_probs=False)
        return out

    def pallas_fwd(q, k, v, r):
        return pallas_banded_forward(q, k, v, r, W, 256)

    def make_fwdbwd(fwd):
        def loss(q, k, v, r):
            return jnp.vdot(fwd(q, k, v, r).astype(jnp.float32), g_out)

        grad = jax.grad(loss, argnums=(0, 1, 2, 3))

        def step(q, k, v, r):
            return grad(q, k, v, r)

        return step

    results = {}
    results["xla_fwd"] = timeit(xla_fwd, q, kpad, vpad, rel)
    results["pallas_fwd"] = timeit(pallas_fwd, q, kpad, vpad, rel)
    results["xla_fwdbwd"] = timeit(make_fwdbwd(xla_fwd), q, kpad, vpad, rel)

    # pallas fwd + pallas bwd through the custom_vjp wrapper
    os.environ["RECONVAT_PALLAS_BWD"] = "1"
    from reconvat_tpu.nn.attention import banded_attention_pallas

    def pallas_custom(q, k, v, r):
        return banded_attention_pallas(q, k, v, r, W, 256)

    results["pallas_fwdbwd"] = timeit(make_fwdbwd(pallas_custom),
                                      q, kpad, vpad, rel)
    del os.environ["RECONVAT_PALLAS_BWD"]
    # pallas fwd + XLA bwd (the current default training path)
    results["pallas_fwd_xla_bwd"] = timeit(make_fwdbwd(pallas_custom),
                                           q, kpad, vpad, rel)

    print(f"# B={B} L={L} H={H} Dh={Dh} W={W} dtype={args.dtype} "
          f"backend={jax.default_backend()}")
    for k, v in results.items():
        print(f"{k:>20s}: {v:8.3f} ms")


if __name__ == "__main__":
    main()
