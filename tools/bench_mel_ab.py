"""A/B: XLA framing-matmul mel frontend vs the fused Pallas STFT+mel
kernel (ops/pallas_mel.py), inside the graphs that matter — the B=128
bf16 serving forward and the full semi-supervised train step.

Round-4 VERDICT weak #3: the Pallas mel kernel (the BASELINE north star)
was never measured in context; this closes the decision. Interleaved
same-process segments, device-resident inputs (per-step H2D through the
dev relay fakes kernel wins — see CLAUDE.md).

    python tools/bench_mel_ab.py [--iters 10] [--segments 4]
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
    ap.add_argument("--serve-batch", type=int, default=128)
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu.train.state import create_train_state, make_train_step

    F = args.frames
    rng = np.random.RandomState(0)

    def build(impl):
        os.environ["RECONVAT_MEL_IMPL"] = impl
        from reconvat_tpu.models.reconvat import ReconVAT

        return ReconVAT(reconstruction=True, compute_dtype="bfloat16")

    print(f"# mel frontend A/B (XLA vs fused Pallas), "
          f"device={jax.devices()[0].device_kind}, "
          f"{args.segments} interleaved segments x {args.iters} iters")

    # -- regime 1: serving forward, B=128 x 640 frames bf16 ---------------
    audio = jax.device_put(
        (rng.randn(args.serve_batch, F * 512) * 0.1).astype(np.float32))

    serve = {}
    for impl in ("xla", "pallas"):
        model = build(impl)
        variables = jax.device_put(model.init(jax.random.PRNGKey(0),
                                              seq_frames=F))
        fwd = jax.jit(lambda v, a, m=model: m.transcribe(v, a))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fwd(variables, audio))
        print(f"  [serve {impl}] compiled in {time.perf_counter() - t0:.0f}s"
              f" (frame[0,0,0]={float(out['frame'][0, 0, 0]):.4f})",
              flush=True)
        serve[impl] = {"fwd": fwd, "vars": variables, "times": []}

    for seg in range(args.segments):
        for impl, v in serve.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = v["fwd"](v["vars"], audio)
            jax.block_until_ready(out["frame"])
            v["times"].append((time.perf_counter() - t0) / args.iters * 1e3)

    # -- regime 2: full semi-supervised train step, B=8+8 bf16 ------------
    def batch(seed):
        r = np.random.RandomState(seed)
        B = args.train_batch
        return {
            "audio": (r.randn(B, F * 512) * 0.1).astype(np.float32),
            "onset": (r.rand(B, F, 88) > 0.97).astype(np.float32),
            "offset": (r.rand(B, F, 88) > 0.97).astype(np.float32),
            "frame": (r.rand(B, F, 88) > 0.9).astype(np.float32),
            "velocity": r.rand(B, F, 88).astype(np.float32),
        }

    bl, bul = jax.device_put((batch(1), batch(2)))
    train = {}
    for impl in ("xla", "pallas"):
        model = build(impl)
        state = jax.device_put(create_train_state(
            model, jax.random.PRNGKey(0), seq_frames=F))
        step = make_train_step(model, alpha=1.0, vat=True,
                               use_unlabeled=True)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, losses = step(state, bl, bul, key)
        jax.block_until_ready(state.params)
        print(f"  [train {impl}] compiled in {time.perf_counter() - t0:.0f}s"
              f" (frame loss {float(losses['loss/train_frame']):.4f})",
              flush=True)
        train[impl] = {"state": state, "step": step, "key": key,
                       "times": []}

    for seg in range(args.segments):
        for impl, v in train.items():
            state = v["state"]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _ = v["step"](state, bl, bul, v["key"])
            jax.block_until_ready(state.params)
            v["times"].append((time.perf_counter() - t0) / args.iters * 1e3)
            v["state"] = state

    for regime, d in (("serve B=128 fwd", serve), ("train step", train)):
        for impl, v in d.items():
            segs = " ".join(f"{t:.1f}" for t in v["times"])
            print(f"{regime:16s} {impl:7s}: best {min(v['times']):7.1f} "
                  f"ms   segments [{segs}]")
        print(f"{regime:16s} speedup pallas vs xla: "
              f"{min(d['xla']['times']) / min(d['pallas']['times']):.3f}x")
    os.environ.pop("RECONVAT_MEL_IMPL", None)


if __name__ == "__main__":
    main()
