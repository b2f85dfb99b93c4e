"""Back-to-back A/B of the attention implementation on the inference path.

Builds BOTH transcribe graphs (attn_impl='xla' and 'pallas') in ONE
process over the SAME parameters and device-resident inputs, then times
them in interleaved segments (x, p, x, p, ...). Interleaving inside one
process removes the relay/session drift that makes separate bench.py
runs incomparable (absolute numbers of the same graph move by several
percent between processes; the *ordering* within one process is stable).

Device compute only (forward + bit-pack + D2H sync): host note decode is
identical for both impls and would just add noise.

Usage: python tools/bench_attn_infer_ab.py [--iters 20] [--segments 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20,
                    help="timed forwards per segment")
    ap.add_argument("--segments", type=int, default=4,
                    help="interleaved segments per impl")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
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
    audio_s = args.batch * samples / C.SAMPLE_RATE
    dtype = None if args.dtype in ("", "float32") else args.dtype

    models = {impl: ReconVAT(reconstruction=True, attn_impl=impl,
                             compute_dtype=dtype)
              for impl in ("xla", "pallas")}
    variables = jax.device_put(
        models["xla"].init(jax.random.PRNGKey(0), seq_frames=frames))

    def make_fwd(model):
        @jax.jit
        def forward(variables, audio_i16):
            audio = audio_i16.astype(jnp.float32) / 32768.0
            return pack_roll_device(model.transcribe(variables, audio)["frame"])
        return forward

    fwds = {impl: make_fwd(m) for impl, m in models.items()}

    rng = np.random.RandomState(0)
    staged = [jax.device_put(
        (rng.randn(args.batch, samples) * 3276.8).astype(np.int16))
        for _ in range(4)]
    jax.block_until_ready(staged)

    dev = jax.devices()[0]
    print(f"# attention inference A/B, B={args.batch} x {frames} frames, "
          f"dtype={args.dtype}, device={dev.device_kind}, "
          f"{args.segments} segments x {args.iters} iters, interleaved")

    outs = {}
    for impl, fwd in fwds.items():   # compile both before any timing
        outs[impl] = np.asarray(fwd(variables, staged[0]))
    match = bool((outs["xla"] == outs["pallas"]).all())
    print(f"# packed rolls identical across impls: {match}")

    times = {"xla": [], "pallas": []}
    for seg in range(args.segments):
        for impl in ("xla", "pallas"):
            fwd = fwds[impl]
            fwd(variables, staged[0]).block_until_ready()   # re-warm
            t0 = time.perf_counter()
            pending = fwd(variables, staged[0])
            for i in range(1, args.iters):
                nxt = fwd(variables, staged[i % len(staged)])
                pending.block_until_ready()
                pending = nxt
            pending.block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
            times[impl].append(dt)
            print(f"#   seg {seg} {impl:7s}: {dt * 1e3:7.2f} ms/batch "
                  f"({audio_s / dt:9.0f} audio-s/s)")

    for impl in ("xla", "pallas"):
        med = float(np.median(times[impl]))
        print(f"{impl:7s}: median {med * 1e3:7.2f} ms/batch = "
              f"{audio_s / med:9.0f} audio-s/s "
              f"(best {audio_s / min(times[impl]):9.0f})")


if __name__ == "__main__":
    main()
