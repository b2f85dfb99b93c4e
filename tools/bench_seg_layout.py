"""Folded vs NHWC layout on the Segmentation (Multi_Inst) VAT train step.

Same harness as tools/bench_unet_layout.py, for the Segmentation family:
its TF-SAME 7-tap/stride-2/transpose geometry goes through the general
fold_conv_kernel / fold_convT_kernel scatters (models/segmentation.py).
This measurement decides resolve_seg_layout's 'auto'.

    python tools/bench_seg_layout.py [--iters 20] [--batch 8] [--dtype bfloat16]
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

    from reconvat_tpu.models.segmentation import SemanticSegmentation
    from reconvat_tpu.train.state import create_train_state, make_train_step

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
    dtype = None if args.dtype == "fp32" else args.dtype
    print(f"# Segmentation VAT step, B={args.batch}+{args.batch} x "
          f"{args.frames} frames, dtype={dtype or 'fp32'}, "
          f"device={jax.devices()[0].device_kind}, iters={args.iters}",
          flush=True)

    results = {}
    for layout in ("folded", "nhwc"):
        model = SemanticSegmentation(compute_dtype=dtype, conv_layout=layout)
        state = jax.device_put(create_train_state(
            model, jax.random.PRNGKey(0), seq_frames=args.frames))
        step = make_train_step(model, alpha=1.0, vat=True,
                               use_unlabeled=True, donate=True)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, losses = step(state, bl, bul, key)
        jax.block_until_ready(state.params)
        print(f"  [{layout}] compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        for _ in range(2):
            state, _ = step(state, bl, bul, key)
        jax.block_until_ready(state.params)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, losses = step(state, bl, bul, key)
            jax.block_until_ready(state.params)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        results[layout] = best
        loss_frame = float(losses["loss/train_frame"])
        print(f"{layout:8s}: {best:8.1f} ms/step  "
              f"(frame loss {loss_frame:.4f})", flush=True)
    print(f"speedup folded vs nhwc: "
          f"{results['nhwc'] / results['folded']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
