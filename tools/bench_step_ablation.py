"""Decompose the flagship train-step time: which part costs what.

Measures the bf16 ReconVAT step with pieces successively removed
(device-resident inputs, best-of-2 x iters):

    full            vat + unlabeled vat + reconstruction + grad + adam
    no_ul_vat       vat on labeled only
    no_vat          plain supervised step (reconstruction chain + grad)
    fwd_loss        forward + losses only, no grad/adam (train-mode BN)
    fwd_eval        forward + losses, eval-mode BN

    python tools/bench_step_ablation.py [--iters 20] [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()


    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.train.state import (create_train_state, make_train_step,
                                          total_loss_from_dict)

    def batch(seed):
        rng = np.random.RandomState(seed)
        B, F = args.batch, args.frames
        return {
            "audio": (rng.randn(B, F * 512) * 0.1).astype(np.float32),
            "onset": (rng.rand(B, F, 88) > 0.97).astype(np.float32),
            "offset": (rng.rand(B, F, 88) > 0.97).astype(np.float32),
            "frame": (rng.rand(B, F, 88) > 0.9).astype(np.float32),
            "velocity": rng.rand(B, F, 88).astype(np.float32),
        }

    bl, bul = jax.device_put((batch(0), batch(1)))
    dtype = None if args.dtype in ("", "float32", "fp32") else args.dtype
    model = ReconVAT(reconstruction=True, compute_dtype=dtype)
    state = jax.device_put(create_train_state(
        model, jax.random.PRNGKey(0), seq_frames=args.frames))
    key = jax.random.PRNGKey(1)
    print(f"# step ablation, B={args.batch} x {args.frames} frames, "
          f"dtype={args.dtype}, device={jax.devices()[0].device_kind}, "
          f"iters={args.iters}")

    def timeit(name, fn, *fargs):
        out = fn(*fargs)
        jax.block_until_ready(out)
        for _ in range(2):
            jax.block_until_ready(fn(*fargs))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*fargs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        print(f"{name:12s}: {best:8.1f} ms", flush=True)
        return best

    step_full = make_train_step(model, 1.0, vat=True, use_unlabeled=True)
    timeit("full", lambda: step_full(state, bl, bul, key))

    step_l = make_train_step(model, 1.0, vat=True, use_unlabeled=False)
    timeit("no_ul_vat", lambda: step_l(state, bl, None, key))

    step_sup = make_train_step(model, 1.0, vat=False, use_unlabeled=False)
    timeit("no_vat", lambda: step_sup(state, bl, None, key))

    @jax.jit
    def fwd_loss(state, b, key):
        _, losses, _, _ = model.run_on_batch(state.variables, b, None, key,
                                             vat=False, train=True)
        return total_loss_from_dict(losses, 1.0)

    timeit("fwd_loss", lambda: fwd_loss(state, bl, key))

    @jax.jit
    def fwd_eval(state, b, key):
        _, losses, _, _ = model.run_on_batch(state.variables, b, None, key,
                                             vat=False, train=False)
        return total_loss_from_dict(losses, 1.0)

    timeit("fwd_eval", lambda: fwd_eval(state, bl, key))


if __name__ == "__main__":
    main()
