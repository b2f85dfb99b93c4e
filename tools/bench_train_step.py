"""Flagship VAT train-step time: XLA vs Pallas attention, fp32 vs bf16.

The synthetic per-op loop (tools/bench_attention.py) lets XLA hoist
loop-invariant K/V preparation, so the banded-attention impl decision is
made here instead: the full semi-supervised ReconVAT step (spectrogram +
VAT on labeled+unlabeled + forward/backward + adam) with every
(attn_impl, backward) combination.

    python tools/bench_train_step.py [--iters 10] [--batch 8]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--h2d", action="store_true",
                    help="re-upload the numpy batches every step")
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu.models.reconvat import ReconVAT
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

    bl, bul = batch(0), batch(1)
    if not args.h2d:
        # the real training loop keeps batches device-resident (H2D
        # double-buffered prefetch), so the impl decision is made on
        # resident inputs; --h2d adds the per-step upload instead.
        bl, bul = jax.device_put((bl, bul))
    print(f"# flagship ReconVAT semi-supervised VAT step, "
          f"B={args.batch}+{args.batch} x {args.frames} frames, "
          f"device={jax.devices()[0].device_kind}, iters={args.iters}, "
          f"inputs={'h2d-per-step' if args.h2d else 'device-resident'}")

    for dtype in ("bfloat16", None):
        for attn_impl, pallas_bwd in (("xla", False), ("pallas", False),
                                      ("pallas", True)):
            # "0" forces the XLA backward (unset would mean
            # dtype-heuristic default, which picks Pallas for bf16)
            os.environ["RECONVAT_PALLAS_BWD"] = "1" if pallas_bwd else "0"
            model = ReconVAT(reconstruction=True, attn_impl=attn_impl,
                             compute_dtype=dtype)
            state = jax.device_put(create_train_state(
                model, jax.random.PRNGKey(0), seq_frames=args.frames))
            step = make_train_step(model, alpha=1.0, vat=True,
                                   use_unlabeled=True, donate=True)
            key = jax.random.PRNGKey(1)
            t0 = time.perf_counter()
            state, losses = step(state, bl, bul, key)
            jax.block_until_ready(state.params)
            print(f"  [{dtype or 'fp32'} attn={attn_impl}"
                  f"{' +pallas_bwd' if pallas_bwd else ''}] compiled in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            for _ in range(2):
                state, _ = step(state, bl, bul, key)
            jax.block_until_ready(state.params)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    state, losses = step(state, bl, bul, key)
                jax.block_until_ready(state.params)
                best = min(best,
                           (time.perf_counter() - t0) / args.iters * 1e3)
            tag = f"{dtype or 'fp32':9s} attn={attn_impl}" + \
                  (" +pallas_bwd" if pallas_bwd else "")
            loss_frame = float(losses["loss/train_frame"])
            print(f"{tag:36s}: {best:8.1f} ms/step  "
                  f"(frame loss {loss_frame:.4f})", flush=True)


if __name__ == "__main__":
    main()
