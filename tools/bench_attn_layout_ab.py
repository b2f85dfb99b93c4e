"""Interleaved A/B of the banded-attention context layout (r5).

head = (B, nb, H, ctx, Dh) halo stacks (einsum-operand order; no H=1
sublane padding); seq = the default (B, nb, ctx, H, Dh) input-order
stacks. MEASURED TIE both ways (serve 59.9 vs 59.5 ms, train 65.8 vs
65.6 ms bf16 — bench_logs/r5_attn_layout_{serve,train}_ab.log); the
default stays seq-major. Both graphs are traced in ONE process over the SAME parameters
and device-resident inputs (the env knob is read at trace time), then
timed in interleaved segments — the only trustworthy comparison on this
relay-attached dev harness (see CLAUDE.md).

Measures the bench.py serve forward (B=128 transcribe + bit-pack) and,
with --train, the flagship semi-supervised train step.

Usage: python tools/bench_attn_layout_ab.py [--train] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="A/B the train step (B=8+8) instead of serving")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from reconvat_tpu.runtime import setup as runtime_setup

    runtime_setup()

    from reconvat_tpu import constants as C
    from reconvat_tpu.models.common import pack_roll_device
    from reconvat_tpu.models.reconvat import ReconVAT

    frames = 640
    samples = frames * C.HOP_LENGTH
    dtype = None if args.dtype in ("", "float32") else args.dtype
    dev = jax.devices()[0]

    def traced_under(layout, build):
        """Trace+compile `build()` with the layout knob pinned."""
        old = os.environ.get("RECONVAT_ATTN_LAYOUT")
        os.environ["RECONVAT_ATTN_LAYOUT"] = layout
        try:
            return build()
        finally:
            if old is None:
                os.environ.pop("RECONVAT_ATTN_LAYOUT", None)
            else:
                os.environ["RECONVAT_ATTN_LAYOUT"] = old

    if args.train:
        B = 8
        from reconvat_tpu.train.state import create_train_state, \
            make_train_step

        model = ReconVAT(reconstruction=True, compute_dtype=dtype)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   seq_frames=frames)
        r = np.random.RandomState(0)

        def batch(seed):
            rr = np.random.RandomState(seed)
            return jax.device_put({
                "audio": (rr.randn(B, samples) * 0.1).astype(np.float32),
                "onset": (rr.rand(B, frames, 88) > 0.97).astype(np.float32),
                "offset": (rr.rand(B, frames, 88) > 0.97).astype(np.float32),
                "frame": (rr.rand(B, frames, 88) > 0.9).astype(np.float32),
                "velocity": rr.rand(B, frames, 88).astype(np.float32),
            })

        bl, bu = batch(0), batch(1)
        key = jax.random.PRNGKey(1)
        per_iter_desc = f"train step B={B}+{B}"

        def build_runner():
            # a fresh jit wrapper per layout: each owns its trace cache
            step = make_train_step(model, 1.0, vat=True, use_unlabeled=True)

            def once():
                nonlocal state_l
                state_l, out = step(state_l, bl, bu, key)
                return out["loss/total"]
            state_l = state
            # compile now, under the pinned env
            once().block_until_ready()
            return once
    else:
        model = ReconVAT(reconstruction=True, compute_dtype=dtype)
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), seq_frames=frames))
        rng = np.random.RandomState(0)
        staged = [jax.device_put(
            (rng.randn(args.batch, samples) * 3276.8).astype(np.int16))
            for _ in range(4)]
        jax.block_until_ready(staged)
        per_iter_desc = f"serve forward B={args.batch}"

        def build_runner():
            @jax.jit
            def forward(variables, audio_i16):
                audio = audio_i16.astype(jnp.float32) / 32768.0
                return pack_roll_device(
                    model.transcribe(variables, audio)["frame"])

            i = [0]

            def once():
                out = forward(variables, staged[i[0] % len(staged)])
                i[0] += 1
                return out
            once().block_until_ready()   # compile under the pinned env
            return once

    runners = {lay: traced_under(lay, build_runner)
               for lay in ("head", "seq")}

    print(f"# banded-attention layout A/B: {per_iter_desc}, dtype="
          f"{args.dtype}, device={dev.device_kind}, "
          f"{args.segments} segments x {args.iters} iters, interleaved")

    times = {"head": [], "seq": []}
    for seg in range(args.segments):
        for lay in ("head", "seq"):
            run = runners[lay]
            run().block_until_ready()    # re-warm
            t0 = time.perf_counter()
            pending = run()
            for _ in range(1, args.iters):
                nxt = run()
                pending.block_until_ready()
                pending = nxt
            pending.block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
            times[lay].append(dt)
            print(f"#   seg {seg} {lay:4s}: {dt * 1e3:7.2f} ms")

    for lay in ("head", "seq"):
        med = float(np.median(times[lay]))
        print(f"{lay:4s}: median {med * 1e3:7.2f} ms "
              f"(best {min(times[lay]) * 1e3:7.2f})")
    print(f"speedup (seq/head medians): "
          f"{np.median(times['seq']) / np.median(times['head']):.3f}x")


if __name__ == "__main__":
    main()
