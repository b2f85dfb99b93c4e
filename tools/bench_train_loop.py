"""End-to-end train-LOOP throughput vs pipeline depth.

tools/bench_train_step.py times the jitted step on resident inputs; this
tool times `train.loop.train_VAT_model` itself — including host batch
assembly, H2D prefetch, and per-step loss readback — across pipeline
depths (0 = the reference's fully synchronous loop, reference
`model/helper_functions.py:570-620`).

Two input regimes, mirroring bench.py's serving regimes:
  resident: every batch pre-staged on device. Isolates the cost of the
            synchronous loss readback (the float() after each step) from
            H2D. This is what a production host's DMA approximates.
  disk:     real corpus -> DataLoader -> prefetch_to_device, fresh H2D
            every step. On this dev harness the remote-TPU relay's H2D
            throughput (~22 MB/s once large executions run) binds the
            number, not the loop — see bench.py regime 2's note.

    python tools/bench_train_loop.py [--iters 30] [--depths 0,1,2,4]
                                     [--regimes resident,disk]
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_batches(n, batch, frames, seed0=0):
    out = []
    for s in range(n):
        rng = np.random.RandomState(seed0 + s)
        out.append({
            "audio": (rng.randn(batch, frames * 512) * 0.1).astype(
                np.float32),
            "onset": (rng.rand(batch, frames, 88) > 0.97).astype(np.float32),
            "offset": (rng.rand(batch, frames, 88) > 0.97).astype(
                np.float32),
            "frame": (rng.rand(batch, frames, 88) > 0.9).astype(np.float32),
            "velocity": rng.rand(batch, frames, 88).astype(np.float32),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--depths", default="0,1,2,4")
    ap.add_argument("--regimes", default="resident,disk")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    depths = [int(d) for d in args.depths.split(",")]
    regimes = args.regimes.split(",")

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.train.loop import train_VAT_model
    from reconvat_tpu.train.state import create_train_state, make_train_step

    model = ReconVAT(reconstruction=True, compute_dtype="bfloat16")
    state0 = jax.device_put(create_train_state(
        model, jax.random.PRNGKey(0), seq_frames=args.frames))
    # donate=True matches the production loop and the cached step
    # executable (tools/bench_train_step.py); every epoch consumes its
    # input state, so state is threaded through all runs below
    step = make_train_step(model, alpha=1.0, vat=True, use_unlabeled=True,
                           donate=True)
    steps = {False: step, True: step}
    audio_s = args.batch * args.frames * 512 / 16000  # labeled audio/step

    print(f"# train_VAT_model loop, B={args.batch}+{args.batch} x "
          f"{args.frames} frames, bf16 folded, iters={args.iters}, "
          f"device={jax.devices()[0].device_kind}")

    def run_epoch(l_iter, ul_iter, depth, state):
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, _ = train_VAT_model(model, state, steps, args.iters, 1,
                                   l_iter, ul_iter, key, vat=True,
                                   vat_start=0, verbose=False,
                                   pipeline=depth)
        jax.block_until_ready(state.params)
        return (time.perf_counter() - t0) / args.iters * 1e3, state

    if "resident" in regimes:
        host = synth_batches(4, args.batch, args.frames)
        staged = jax.device_put(host)
        jax.block_until_ready(staged)
        # compile once
        _, state = run_epoch(itertools.cycle(staged),
                             itertools.cycle(staged[::-1]), 1, state0)
        print("## regime resident (batches pre-staged on device)")
        for depth in depths:
            best = float("inf")
            for _ in range(args.repeats):
                ms, state = run_epoch(itertools.cycle(staged),
                                      itertools.cycle(staged[::-1]),
                                      depth, state)
                best = min(best, ms)
            print(f"  pipeline={depth}: {best:7.1f} ms/step  "
                  f"({audio_s / best * 1e3:7.0f} audio-s/s)", flush=True)

    if "disk" in regimes:
        from tests import synth_data

        from reconvat_tpu.data.datasets import MAPS
        from reconvat_tpu.data.loader import (DataLoader, cycle,
                                              prefetch_to_device)

        root = "/tmp/bench_loop_maps"
        if not os.path.isdir(root):
            synth_data.make_maps_like(
                root, groups=("AkPnBcht",), files_per_group=6,
                duration_s=args.frames * 512 / 16000 + 2.0)
        ds = MAPS(root, groups=["AkPnBcht"],
                  sequence_length=args.frames * 512)
        print(f"## regime disk (DataLoader over {len(ds)} files + "
              "prefetch_to_device, fresh H2D per step; dev-relay-bound "
              "here, see module docstring)")
        state = state0 if "resident" not in regimes else state
        for depth in depths:
            loader_l = DataLoader(ds, args.batch, shuffle=True, seed=1)
            loader_ul = DataLoader(ds, args.batch, shuffle=True, seed=2)
            l_iter = prefetch_to_device(cycle(loader_l))
            ul_iter = prefetch_to_device(cycle(loader_ul))
            ms, state = run_epoch(l_iter, ul_iter, depth, state)
            ms2, state = run_epoch(l_iter, ul_iter, depth, state)
            best = min(ms, ms2)
            print(f"  pipeline={depth}: {best:7.1f} ms/step  "
                  f"({audio_s / best * 1e3:7.0f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
