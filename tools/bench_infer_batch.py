"""Interleaved batch-size sweep for bench.py's resident serving regime.

Same depth-3 + async-D2H pipeline as bench.py regime 1, run at several
batch sizes interleaved in one process (the relay drifts across
processes — medians across interleaved segments are the only fair A/B,
see CLAUDE.md). Decides bench.py's BENCH_BATCH default.

    BENCH_BATCHES=32,64,128 python tools/bench_infer_batch.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from reconvat_tpu.runtime import setup as runtime_setup

    runtime_setup()

    from reconvat_tpu import constants as C
    from reconvat_tpu import decode
    from reconvat_tpu.models.common import pack_roll_device
    from reconvat_tpu.models.reconvat import ReconVAT

    batches = [int(b) for b in
               os.environ.get("BENCH_BATCHES", "32,64").split(",")]
    segments = int(os.environ.get("BENCH_SEGMENTS", 4))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", 3))
    frames = 640
    samples = frames * C.HOP_LENGTH

    model = ReconVAT(reconstruction=True, compute_dtype="bfloat16")
    variables = jax.device_put(model.init(jax.random.PRNGKey(0),
                                          seq_frames=frames))

    @jax.jit
    def forward(variables, audio_i16):
        audio = audio_i16.astype(jnp.float32) / 32768.0
        return pack_roll_device(model.transcribe(variables, audio)["frame"])

    def _decode_batch(packed):
        decode.extract_notes_packed_batch(packed, rule="rule2")

    rng = np.random.RandomState(0)
    staged = {}
    for b in batches:
        host = [(rng.randn(b, samples) * 3276.8).astype(np.int16)
                for _ in range(4)]
        staged[b] = [jax.device_put(x) for x in host]
        jax.block_until_ready(staged[b])
        r = forward(variables, staged[b][0])  # compile per shape
        _decode_batch(np.asarray(r))

    def run(b):
        bufs = staged[b]
        t0 = time.perf_counter()
        pending = []
        i = 0
        while i < iters or pending:
            while i < iters and len(pending) < depth:
                buf = forward(variables, bufs[i % len(bufs)])
                buf.copy_to_host_async()
                pending.append(buf)
                i += 1
            _decode_batch(np.asarray(pending.pop(0)))
        return time.perf_counter() - t0

    times = {b: [] for b in batches}
    for seg in range(segments):
        for b in batches:
            dt = run(b)
            times[b].append(dt)
            audio_s = b * samples / C.SAMPLE_RATE
            print(f"#   seg {seg} B={b:4d}: {dt / iters * 1000:7.2f} ms/iter"
                  f" ({audio_s * iters / dt:9.0f} audio-s/s)", flush=True)
    print(f"# depth={depth} async D2H, {segments} segments x {iters} iters,"
          f" interleaved, device={jax.devices()[0].device_kind}")
    for b in batches:
        med = float(np.median(times[b]))
        audio_s = b * samples / C.SAMPLE_RATE
        print(f"B={b:4d}: median {med / iters * 1000:7.2f} ms/iter = "
              f"{audio_s * iters / med:9.0f} audio-s/s "
              f"(best {audio_s * iters / min(times[b]):9.0f})")


if __name__ == "__main__":
    main()
