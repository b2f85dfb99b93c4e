"""Benchmark: audio-seconds transcribed per second per chip.

Measures the flagship ReconVAT transcription path end to end on one chip:
device compute (mel frontend + UNet + reconstruction chain) + host decode
(posteriogram -> note events). Baseline is the north-star 50x realtime
(BASELINE.md — the reference publishes no numbers), so
vs_baseline = realtime_factor / 50.

Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from reconvat_tpu.runtime import setup as runtime_setup

    runtime_setup()

    from reconvat_tpu import constants as C
    from reconvat_tpu import decode
    from reconvat_tpu.models.reconvat import ReconVAT

    batch = int(os.environ.get("BENCH_BATCH", 32))
    frames = 640
    samples = frames * C.HOP_LENGTH  # 327680 => 20.48 s per item
    audio_seconds_per_batch = batch * samples / C.SAMPLE_RATE

    attn_impl = os.environ.get("BENCH_ATTN", "pallas")
    # bf16 compute is 1.19x the fp32 forward at 6e-6 posteriogram diff
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = ReconVAT(reconstruction=True, attn_impl=attn_impl,
                     compute_dtype=None if dtype in ("", "float32")
                     else dtype)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=frames)
    # Random init makes every sigmoid hover around 0.5, i.e. a posteriogram
    # that is ~50% "active" — two orders of magnitude denser than any
    # trained transcriber output, which makes host decode the artificial
    # bottleneck. Bias the output head so the roll has trained-model-like
    # sparsity (~2% active) while keeping full device compute.
    import jax as _jax

    def _bias_head(params):
        params = _jax.tree_util.tree_map(np.asarray, dict(params))
        for sub in ("transcriber",):
            lin = params[sub]["linear1"]
            lin["bias"] = lin["bias"] - 2.0
        return params

    variables = {**variables, "params": _bias_head(variables["params"])}
    # keep params resident on device — numpy leaves would be re-uploaded
    # on every dispatch
    variables = jax.device_put(variables)

    import jax.numpy as jnp

    # device-side thresholding + bit-packing: the host decoder only needs
    # booleans, and the device->host link is the bottleneck on this setup
    # (~120 MB/s relay). fp32 roll = 14.4 MB/batch; packed bits = 0.45 MB.
    pow2 = jnp.asarray(2 ** np.arange(8), jnp.uint8)

    @jax.jit
    def forward(variables, audio_i16):
        # int16 -> float/32768 on device, exactly like the data pipeline
        # stores audio (`data/datasets.py`); H2D moves half the bytes
        audio = audio_i16.astype(jnp.float32) / 32768.0
        preds = model.transcribe(variables, audio)
        bits = (preds["frame"] > 0.5).astype(jnp.uint8)   # (B, T, 88)
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, 96 - 88)))
        packed = jnp.einsum("btkj,j->btk",
                            bits.reshape(*bits.shape[:2], 12, 8), pow2)
        return packed.astype(jnp.uint8)

    def unpack(packed):
        bits = np.unpackbits(packed, axis=-1, bitorder="little")
        return bits.reshape(*packed.shape[:2], 96)[..., :88]

    # fresh host batches uploaded every iteration: the H2D transfer is part
    # of the measured loop (a distinct batch per iteration, rotated)
    iters = int(os.environ.get("BENCH_ITERS", 20))
    rng = np.random.RandomState(0)
    host_batches = [(rng.randn(batch, samples) * 3276.8).astype(np.int16)
                    for _ in range(min(iters, 8))]

    # warmup / compile
    roll = forward(variables, jax.device_put(host_batches[0]))
    roll.block_until_ready()

    t0 = time.perf_counter()
    # software pipeline: upload + device forward i+1 are in flight while
    # the host decodes batch i (jax dispatch is async; np.asarray syncs)
    pending = forward(variables, jax.device_put(host_batches[0]))
    for i in range(1, iters):
        nxt = forward(variables,
                      jax.device_put(host_batches[i % len(host_batches)]))
        roll_host = unpack(np.asarray(pending))
        for b in range(batch):
            decode.extract_notes_wo_velocity(roll_host[b], roll_host[b],
                                             rule="rule2")
        pending = nxt
    roll_host = unpack(np.asarray(pending))
    for b in range(batch):
        decode.extract_notes_wo_velocity(roll_host[b], roll_host[b],
                                         rule="rule2")
    dt = time.perf_counter() - t0

    realtime = audio_seconds_per_batch * iters / dt
    result = {
        "metric": "audio-seconds transcribed/sec/chip (ReconVAT, incl. "
                  "H2D int16 audio upload + mel frontend + reconstruction "
                  "chain + host note decode)",
        "value": round(realtime, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(realtime / 50.0, 3),
        "input": "fresh int16 noise batches uploaded per iteration; output "
                 "head biased to trained-model roll sparsity (~2%) for a "
                 "realistic host-decode load",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
