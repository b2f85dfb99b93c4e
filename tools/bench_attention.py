"""Microbenchmark: banded local attention fwd / fwd+bwd, XLA vs Pallas.

Measures the flagship attention shape (reference `MutliHeadAttention1D`
229->916, window 31, 4 heads at B=8, L=640 — `model/self_attention.py:6`)
on the real TPU chip. Used to decide the default attention impl
(VERDICT round 1, item 6).

Methodology: the host here is a single-core VM driving the chip through a
remote relay, so per-dispatch timing is dominated by host noise. Each
variant therefore runs N iterations inside ONE jitted lax.fori_loop (one
dispatch, pure device time), with the input scaled by a per-iteration
factor so no iteration can be CSE'd away.

    python tools/bench_attention.py [--dtype bf16|f32] [--iters 100]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--iters", type=int, default=100)
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
    from reconvat_tpu.ops.pallas_attention_bwd import pallas_banded_backward

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

    def device_time(body, iters=args.iters):
        """Time `body(q_scaled)` run `iters` times inside one jit."""

        @jax.jit
        def loop(q0):
            def it(i, acc):
                qi = q0 * (1.0 + 1e-6 * i.astype(q0.dtype))
                return acc + body(qi)

            return jax.lax.fori_loop(0, iters, it, jnp.zeros((), jnp.float32))

        jax.block_until_ready(loop(q))          # compile
        t0 = time.perf_counter()
        jax.block_until_ready(loop(q))
        once = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(q))
        twice = time.perf_counter() - t0
        return min(once, twice) / iters * 1e3

    def xla_fwd(qi):
        out, _ = banded_attention(qi, kpad, vpad, rel, W, block_size=128,
                                  return_probs=False)
        return jnp.vdot(out.astype(jnp.float32), g_out)

    def pallas_fwd(qi):
        out = pallas_banded_forward(qi, kpad, vpad, rel, W, 256)
        return jnp.vdot(out, g_out)

    def make_fwdbwd(fwd):
        grad = jax.value_and_grad(
            lambda qi, k, v, r: fwd_inner(fwd, qi, k, v, r),
            argnums=(0, 1, 2, 3))

        def body(qi):
            val, grads = grad(qi, kpad, vpad, rel)
            return val + sum(jnp.vdot(g.astype(jnp.float32),
                                      g.astype(jnp.float32))
                             for g in grads) * 1e-9

        return body

    def fwd_inner(fwd, qi, k, v, r):
        return fwd(qi, k, v, r)

    def xla_full(qi, k, v, r):
        out, _ = banded_attention(qi, k, v, r, W, block_size=128,
                                  return_probs=False)
        return jnp.vdot(out.astype(jnp.float32), g_out)

    def pallas_manual_fwdbwd(qi):
        out = pallas_banded_forward(qi, kpad, vpad, rel, W, 256)
        val = jnp.vdot(out, g_out)
        dq, dk, dv, dr = pallas_banded_backward(qi, kpad, vpad, rel, g_out,
                                                W, 256)
        reg = (jnp.vdot(dq.astype(jnp.float32), dq.astype(jnp.float32))
               + jnp.vdot(dk.astype(jnp.float32), dk.astype(jnp.float32))
               + jnp.vdot(dv.astype(jnp.float32), dv.astype(jnp.float32))
               + jnp.vdot(dr.astype(jnp.float32), dr.astype(jnp.float32)))
        return val + reg * 1e-9

    results = {}
    results["xla_fwd"] = device_time(xla_fwd)
    results["pallas_fwd"] = device_time(pallas_fwd)
    results["xla_fwdbwd"] = device_time(make_fwdbwd(xla_full))
    results["pallas_fwdbwd"] = device_time(pallas_manual_fwdbwd)

    print(f"# B={B} L={L} H={H} Dh={Dh} W={W} dtype={args.dtype} "
          f"device={jax.devices()[0].device_kind} iters={args.iters} "
          f"(device time via fori_loop, min of 2 runs)")
    for k, v in results.items():
        print(f"{k:>20s}: {v:8.3f} ms")


if __name__ == "__main__":
    main()
