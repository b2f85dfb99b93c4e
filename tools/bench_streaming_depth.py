"""Measure transcribe_streaming's pipeline_depth on chip.

A long recording (default ~7 min) transcribed with the bounded-memory
haloed-window path at pipeline depths 1 and 3 (interleaved segments, one
process — relay drift rule, see CLAUDE.md). Output is identical for any
depth (tests/test_streaming_transcribe.py::
test_streaming_pipeline_depth_identical); this measures wall-clock only.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu import constants as C
    from reconvat_tpu.models.reconvat import ReconVAT

    minutes = float(os.environ.get("BENCH_MINUTES", 7))
    G = int(os.environ.get("BENCH_WINDOWS", 4))
    segments = int(os.environ.get("BENCH_SEGMENTS", 3))
    n = int(minutes * 60 * C.SAMPLE_RATE)
    rng = np.random.RandomState(0)
    audio = jax.device_put((rng.randn(1, n) * 0.1).astype(np.float32))

    model = ReconVAT(reconstruction=True, attn_impl="auto",
                     compute_dtype="bfloat16")
    variables = jax.device_put(model.init(jax.random.PRNGKey(0)))

    # warmup/compile both paths once
    for d in (1, 3):
        model.transcribe_streaming(variables, audio, windows_per_batch=G,
                                   pipeline_depth=d)
    audio_s = n / C.SAMPLE_RATE
    times = {1: [], 3: []}
    for seg in range(segments):
        for d in (1, 3):
            t0 = time.perf_counter()
            model.transcribe_streaming(variables, audio,
                                       windows_per_batch=G,
                                       pipeline_depth=d)
            dt = time.perf_counter() - t0
            times[d].append(dt)
            print(f"#   seg {seg} depth={d}: {dt:6.2f} s "
                  f"({audio_s / dt:8.0f} audio-s/s)", flush=True)
    print(f"# streaming {minutes:.0f}-min song, windows_per_batch={G}, "
          f"{segments} interleaved segments, "
          f"device={jax.devices()[0].device_kind}")
    for d in (1, 3):
        med = float(np.median(times[d]))
        print(f"depth={d}: median {med:6.2f} s = {audio_s / med:8.0f} "
              f"audio-s/s (best {audio_s / min(times[d]):8.0f})")


if __name__ == "__main__":
    main()
