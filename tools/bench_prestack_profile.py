"""Where do Prestack's 189 ms/step go? (round-4 VERDICT weak #4)

Per-part on-chip timing of the Prestack pipeline at the families-bench
shape (B=1 x 640 frames = 640 stride-1 229x25 patches,
`model/Unet_prestack.py:148-157`): spectrogram, patch gather, stride-1
U-Net encoder/decoder, ResNet-18, full forward, full train step — plus
XLA cost analysis (FLOPs / HBM bytes) for the step, so the MFU and the
memory-bound share are explicit.

    python tools/bench_prestack_profile.py [--iters 5] [--frames 640]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "fp32"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu.models.prestack import Prestack
    from reconvat_tpu.train.state import create_train_state, make_train_step

    dtype = None if args.dtype == "fp32" else "bfloat16"
    model = Prestack(compute_dtype=dtype)
    B, F = args.batch, args.frames
    rng = np.random.RandomState(0)
    batch = {
        "audio": (rng.randn(B, F * 512) * 0.1).astype(np.float32),
        "frame": (rng.rand(B, F, 88) > 0.9).astype(np.float32),
        "onset": (rng.rand(B, F, 88) > 0.97).astype(np.float32),
        "offset": (rng.rand(B, F, 88) > 0.97).astype(np.float32),
        "velocity": rng.rand(B, F, 88).astype(np.float32),
    }
    batch = jax.device_put(batch)
    state = jax.device_put(create_train_state(model, jax.random.PRNGKey(0),
                                              seq_frames=F))
    variables = state.variables
    mod = model.module
    print(f"# Prestack profile, B={B} x {F} frames "
          f"({B * F} patches of {model.n_bins}x{mod.patch}), "
          f"{args.dtype}, device={jax.devices()[0].device_kind}")

    def timed(name, fn, *inputs, analyze=False):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(jfn(*inputs))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jfn(*inputs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        line = f"{name:28s}: {best:8.2f} ms   (compile {compile_s:.0f}s)"
        if analyze:
            cost = jfn.lower(*inputs).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            fl = cost.get("flops", 0.0)
            by = cost.get("bytes accessed", 0.0)
            peak = 800e9  # v5e HBM GB/s
            mfu = fl / (best / 1e3) / 197e12 * 100
            line += (f"   {fl / 1e12:.2f} TFLOP, {by / 1e9:.1f} GB"
                     f" -> {mfu:.0f}% MFU,"
                     f" mem roofline {by / peak * 1e3:.0f} ms")
        print(line, flush=True)
        return out

    spec = timed("spectrogram+norm",
                 lambda a: model.make_spec(a), batch["audio"])

    pad = mod.patch // 2
    idx = np.arange(F)[:, None] + np.arange(mod.patch)[None, :]

    def extract(spec):
        padded = jnp.pad(spec, ((0, 0), (pad, pad), (0, 0)))
        patches = jnp.swapaxes(padded[:, idx], 2, 3)
        return patches.reshape(B * F, model.n_bins, mod.patch, 1)

    x = timed("patch gather", extract, spec)

    def enc(x):
        return mod.apply(variables, x, False,
                         method=lambda m, x, t: m.Unet1_encoder(x, t))

    z, s, c = timed("U-Net encoder fwd", enc, x)
    # skip-connection target sizes are static shape metadata — jit's
    # round-trip turned them into arrays; back to host ints so the
    # decoder's output_size stays concrete
    s = jax.tree_util.tree_map(int, jax.device_get(s))

    def dec(z, c):
        return mod.apply(variables, z, c, False,
                         method=lambda m, z, c, t:
                         m.Unet1_decoder(z, s, c, t))

    y = timed("U-Net decoder fwd", dec, z, c)

    def res(y):
        return mod.apply(variables, y, False,
                         method=lambda m, y, t: m.resnet(y, t))

    timed("ResNet-18 fwd", res, y)

    timed("full forward (eval)",
          lambda a: mod.apply(variables, model.make_spec(a), False),
          batch["audio"], analyze=True)

    step = make_train_step(model, alpha=1.0, vat=False, use_unlabeled=False)
    key = jax.random.PRNGKey(1)

    def full_step(state, batch):
        return step(state, batch, None, key)

    jstep = jax.jit(lambda s, b: step(s, b, None, key))
    t0 = time.perf_counter()
    new_state, _ = jstep(state, batch)
    jax.block_until_ready(new_state.params)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            new_state, _ = jstep(new_state, batch)
        jax.block_until_ready(new_state.params)
        best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
    cost = jstep.lower(state, batch).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl, by = cost.get("flops", 0.0), cost.get("bytes accessed", 0.0)
    print(f"{'full train step':28s}: {best:8.2f} ms   "
          f"(compile {compile_s:.0f}s)   {fl / 1e12:.2f} TFLOP, "
          f"{by / 1e9:.1f} GB -> {fl / (best / 1e3) / 197e12 * 100:.0f}% "
          f"MFU, mem roofline {by / 800e9 * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
