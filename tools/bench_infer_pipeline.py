"""A/B the inference host pipeline depth for bench.py's resident regime.

bench.py's regime-1 loop is a depth-1 software pipeline: dispatch forward
i+1, then synchronously fetch + decode batch i. The pure device forward
measures 23.5 ms/batch (tools/bench_attn_infer_ab.py) but the pipelined
headline lands at ~31.8 ms/iter — ~8 ms of per-iter D2H + dispatch latency
through the dev relay is not hidden. Variants measured here (all produce
identical decoded output):

  d1        depth-1, sync np.asarray fetch             (bench.py today)
  d1_async  depth-1 + copy_to_host_async as soon as the next forward is
            dispatched (D2H overlaps the in-flight execution)
  d2        depth-2 pending queue (two executions in flight)
  d2_async  depth-2 + copy_to_host_async
  d3_async  depth-3 + copy_to_host_async

Interleaved segments in one process (the relay drifts across processes;
see CLAUDE.md) — trust medians across segments, not single runs.
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

    batch = int(os.environ.get("BENCH_BATCH", 32))
    frames = 640
    samples = frames * C.HOP_LENGTH
    audio_s = batch * samples / C.SAMPLE_RATE
    iters = int(os.environ.get("BENCH_ITERS", 20))
    segments = int(os.environ.get("BENCH_SEGMENTS", 4))

    model = ReconVAT(reconstruction=True, attn_impl="auto",
                     compute_dtype="bfloat16")
    variables = jax.device_put(model.init(jax.random.PRNGKey(0),
                                          seq_frames=frames))

    @jax.jit
    def forward(variables, audio_i16):
        audio = audio_i16.astype(jnp.float32) / 32768.0
        preds = model.transcribe(variables, audio)
        return pack_roll_device(preds["frame"])

    rng = np.random.RandomState(0)
    host_batches = [(rng.randn(batch, samples) * 3276.8).astype(np.int16)
                    for _ in range(8)]
    staged = [jax.device_put(b) for b in host_batches]
    jax.block_until_ready(staged)

    def _decode_batch(packed):
        decode.extract_notes_packed_batch(packed, rule="rule2")

    # warmup / compile
    r = forward(variables, staged[0])
    r.block_until_ready()
    _decode_batch(np.asarray(r))

    def run_depth(depth, async_d2h):
        t0 = time.perf_counter()
        pending = []
        i = 0
        while i < iters or pending:
            while i < iters and len(pending) < depth:
                buf = forward(variables, staged[i % len(staged)])
                if async_d2h:
                    buf.copy_to_host_async()
                pending.append(buf)
                i += 1
            _decode_batch(np.asarray(pending.pop(0)))
        return time.perf_counter() - t0

    variants = [("d1", 1, False), ("d1_async", 1, True),
                ("d2", 2, False), ("d2_async", 2, True),
                ("d3_async", 3, True)]
    times = {name: [] for name, _, _ in variants}
    for seg in range(segments):
        for name, depth, async_d2h in variants:
            dt = run_depth(depth, async_d2h)
            times[name].append(dt)
            print(f"#   seg {seg} {name:9s}: {dt / iters * 1000:7.2f} ms/iter"
                  f" ({audio_s * iters / dt:9.0f} audio-s/s)", flush=True)
    print(f"# B={batch} x {frames} frames, {segments} segments x {iters} "
          f"iters, interleaved, device={jax.devices()[0].device_kind}")
    for name, _, _ in variants:
        med = float(np.median(times[name]))
        best = float(np.min(times[name]))
        print(f"{name:9s}: median {med / iters * 1000:7.2f} ms/iter = "
              f"{audio_s * iters / med:9.0f} audio-s/s "
              f"(best {audio_s * iters / best:9.0f})")


if __name__ == "__main__":
    main()
