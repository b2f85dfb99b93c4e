"""Break down the bench.py pipeline: device forward vs D2H vs host decode.

Run on the real TPU. Prints per-stage times so we know which stage bounds
the pipelined throughput (bench.py regime 1) and whether threading the
host decode (ctypes releases the GIL) would raise it.
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
    from reconvat_tpu.models.reconvat import ReconVAT

    batch = int(os.environ.get("BENCH_BATCH", 32))
    frames = 640
    samples = frames * C.HOP_LENGTH
    audio_s = batch * samples / C.SAMPLE_RATE

    model = ReconVAT(reconstruction=True, attn_impl="auto",
                     compute_dtype="bfloat16")
    variables = jax.device_put(
        model.init(jax.random.PRNGKey(0), seq_frames=frames))

    from reconvat_tpu.models.common import pack_roll_device

    @jax.jit
    def forward(variables, audio_i16):
        audio = audio_i16.astype(jnp.float32) / 32768.0
        preds = model.transcribe(variables, audio)
        return pack_roll_device(preds["frame"])

    unpack = decode.unpack_roll

    rng = np.random.RandomState(0)
    host = [(rng.randn(batch, samples) * 3276.8).astype(np.int16)
            for _ in range(4)]
    staged = [jax.device_put(b) for b in host]
    jax.block_until_ready(staged)

    out = forward(variables, staged[0])
    out.block_until_ready()

    iters = int(os.environ.get("BENCH_ITERS", 20))

    # 1. device forward alone (no D2H beyond the tiny packed buffer handle)
    t0 = time.perf_counter()
    for i in range(iters):
        out = forward(variables, staged[i % len(staged)])
    out.block_until_ready()
    fwd_ms = (time.perf_counter() - t0) / iters * 1e3

    # 2. D2H of the packed roll
    t0 = time.perf_counter()
    for _ in range(iters):
        packed_host = np.asarray(out)
    d2h_ms = (time.perf_counter() - t0) / iters * 1e3

    # 3. host decode: legacy per-item float path (unpack + 32 calls)
    t0 = time.perf_counter()
    for _ in range(iters):
        roll = unpack(packed_host)
        for b in range(batch):
            decode.extract_notes_wo_velocity(roll[b], roll[b], rule="rule2")
    dec_ms = (time.perf_counter() - t0) / iters * 1e3

    # 4. host decode: one batched native call on the packed bits
    t0 = time.perf_counter()
    for _ in range(iters):
        decode.extract_notes_packed_batch(packed_host, rule="rule2")
    dect_ms = (time.perf_counter() - t0) / iters * 1e3

    print(f"batch={batch} audio_s/batch={audio_s:.1f}")
    print(f"device forward      : {fwd_ms:8.2f} ms  "
          f"({audio_s / fwd_ms * 1e3:8.0f} audio-s/s)")
    print(f"D2H packed roll     : {d2h_ms:8.2f} ms")
    print(f"decode float path   : {dec_ms:8.2f} ms")
    print(f"decode packed batch : {dect_ms:8.2f} ms")
    tot_pipe = max(fwd_ms, d2h_ms + dec_ms)
    tot_pipe_t = max(fwd_ms, d2h_ms + dect_ms)
    print(f"pipelined bound (float) : {audio_s / tot_pipe * 1e3:8.0f} audio-s/s")
    print(f"pipelined bound (packed): {audio_s / tot_pipe_t * 1e3:8.0f} audio-s/s")


if __name__ == "__main__":
    main()
