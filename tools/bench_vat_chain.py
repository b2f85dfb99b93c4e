"""A/B: vat_chain='separate' (reference's two B-chains) vs 'batched'
(one frozen-BN 2B-chain) on the full flagship semi-supervised step.

Round-4 VERDICT weak #5: the labeled and unlabeled VAT chains run as
separate B=8 pass sequences (`model/UNet_onset.py:425-446` in the
reference); with frozen BN, one [spec_l; spec_ul] chain is per-segment
identical math (tests/test_vat_batched_chain.py), halves the chain
launches, and presents 2x-batch matmuls. This measures whether that
actually wins on chip.

Interleaved same-process segments (A,B,A,B,...) with device-resident
inputs — per-step H2D through the dev relay produces spurious wins
(see CLAUDE.md), and separate processes hide clock drift.

    python tools/bench_vat_chain.py [--iters 10] [--segments 4]
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
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--family", choices=("reconvat", "unet_onset"),
                    default="reconvat")
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

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
    print(f"# {args.family} semi-supervised step, vat_chain A/B, "
          f"B={args.batch}+{args.batch} x {args.frames} frames, bf16, "
          f"device={jax.devices()[0].device_kind}, "
          f"{args.segments} interleaved segments x {args.iters} iters")

    def make(vat_chain):
        if args.family == "reconvat":
            from reconvat_tpu.models.reconvat import ReconVAT

            model = ReconVAT(reconstruction=True, compute_dtype="bfloat16",
                             vat_chain=vat_chain)
        else:
            from reconvat_tpu.models.unet_onset import UNetOnset

            model = UNetOnset(reconstruction=True, compute_dtype="bfloat16",
                              vat_chain=vat_chain)
        state = jax.device_put(create_train_state(
            model, jax.random.PRNGKey(0), seq_frames=args.frames))
        # donate=False: both variants share timing segments in one
        # process, so keep states independent of buffer reuse
        step = make_train_step(model, alpha=1.0, vat=True,
                               use_unlabeled=True)
        return state, step

    variants = {}
    for name in ("separate", "batched"):
        t0 = time.perf_counter()
        state, step = make(name)
        key = jax.random.PRNGKey(1)
        state, losses = step(state, bl, bul, key)
        jax.block_until_ready(state.params)
        print(f"  [{name}] compiled in {time.perf_counter() - t0:.0f}s "
              f"(frame loss {float(losses['loss/train_frame']):.4f})",
              flush=True)
        for _ in range(2):
            state, _ = step(state, bl, bul, key)
        jax.block_until_ready(state.params)
        variants[name] = {"state": state, "step": step, "key": key,
                          "times": []}

    for seg in range(args.segments):
        for name, v in variants.items():
            state, step, key = v["state"], v["step"], v["key"]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _ = step(state, bl, bul, key)
            jax.block_until_ready(state.params)
            v["times"].append((time.perf_counter() - t0) / args.iters * 1e3)
            v["state"] = state

    for name, v in variants.items():
        best = min(v["times"])
        segs = " ".join(f"{t:.1f}" for t in v["times"])
        print(f"{name:9s}: best {best:7.1f} ms/step   segments [{segs}]")
    sep = min(variants["separate"]["times"])
    bat = min(variants["batched"]["times"])
    print(f"speedup batched vs separate: {sep / bat:.3f}x")


if __name__ == "__main__":
    main()
