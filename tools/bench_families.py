"""Per-family train-step benchmark: fp32 vs bf16 compute on the real chip.

Measures one supervised train step (spectrogram + forward + backward +
adam) for every model family at its reference CLI batch/sequence shape
(`train_UNet_Onset_VAT.py:54-56`, `train_baseline_*.py`). Prints a
markdown table for the README.

    python tools/bench_families.py [--iters 20] [--families a,b,...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _batch(batch, frames, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "audio": (rng.randn(batch, frames * 512) * 0.1).astype(np.float32),
        "onset": (rng.rand(batch, frames, 88) > 0.97).astype(np.float32),
        "offset": (rng.rand(batch, frames, 88) > 0.97).astype(np.float32),
        "frame": (rng.rand(batch, frames, 88) > 0.9).astype(np.float32),
        "velocity": rng.rand(batch, frames, 88).astype(np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--families", default="")
    ap.add_argument("--vat", action="store_true",
                    help="also measure the semi-supervised VAT step for "
                         "the VAT-capable families")
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu.models.onsets_frames import OnsetsAndFrames
    from reconvat_tpu.models.prestack import Prestack
    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.models.segmentation import SemanticSegmentation
    from reconvat_tpu.models.thickstun import Thickstun
    from reconvat_tpu.models.unet_onset import UNetOnset
    from reconvat_tpu.train.state import create_train_state, make_train_step

    # (name, factory(dtype), batch, frames, supports_vat)
    cases = [
        ("ReconVAT",
         lambda d: ReconVAT(reconstruction=True, compute_dtype=d),
         8, 640, True),
        ("UNetOnset",
         lambda d: UNetOnset(reconstruction=True, compute_dtype=d),
         8, 640, True),
        ("OnsetsAndFrames",
         lambda d: OnsetsAndFrames(compute_dtype=d), 8, 640, True),
        ("Segmentation",
         lambda d: SemanticSegmentation(compute_dtype=d), 8, 640, True),
        ("Thickstun", lambda d: Thickstun(compute_dtype=d), 1, 640, False),
        ("Prestack", lambda d: Prestack(compute_dtype=d), 1, 640, False),
    ]
    if args.families:
        keep = set(args.families.split(","))
        cases = [c for c in cases if c[0] in keep]

    print(f"# device: {jax.devices()[0].device_kind}, iters={args.iters}")
    print("| Family | batch x frames | fp32 ms/step | bf16 ms/step | "
          "speedup |")
    print("|---|---|---|---|---|")

    for name, make, batch, frames, supports_vat in cases:
        vat = bool(args.vat and supports_vat)
        # device-resident batches: the production loop prefetches H2D, and
        # per-step uploads through the dev relay would dominate the timing
        # (see tools/bench_train_step.py)
        bl = jax.device_put(_batch(batch, frames, 0))
        bul = jax.device_put(_batch(batch, frames, 1)) if vat else None
        times = {}
        for dtype in (None, "bfloat16"):
            model = make(dtype)
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       seq_frames=frames)
            state = jax.device_put(state)
            step = make_train_step(model, alpha=1.0, vat=vat,
                                   use_unlabeled=vat)
            key = jax.random.PRNGKey(1)
            t_compile = time.perf_counter()
            state, losses = step(state, bl, bul, key)
            jax.block_until_ready(state.params)
            compile_s = time.perf_counter() - t_compile
            for _ in range(3):
                state, losses = step(state, bl, bul, key)
            jax.block_until_ready(state.params)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, losses = step(state, bl, bul, key)
            jax.block_until_ready(state.params)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            times[dtype] = ms
            tag = dtype or "fp32"
            print(f"#   {name} {tag}: {ms:.1f} ms/step "
                  f"(compile {compile_s:.0f}s, losses "
                  f"{ {k: round(float(v), 3) for k, v in losses.items()} })",
                  flush=True)
        sp = times[None] / times["bfloat16"]
        label = name + (" (VAT)" if vat else "")
        print(f"| {label} | {batch} x {frames} | {times[None]:.0f} | "
              f"{times['bfloat16']:.0f} | {sp:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
