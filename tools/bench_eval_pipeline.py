"""Full-song evaluation throughput vs pipeline depth.

`evaluate_wo_velocity(pipeline=d)` keeps the next song's bucketed jitted
forward in flight while the host extracts notes and bipartite-matches
intervals for the current song. This measures the wall-clock effect on a
synthetic corpus of same-length songs (one bucket -> one compile).

    python tools/bench_eval_pipeline.py [--songs 12] [--frames 640]
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
    ap.add_argument("--songs", type=int, default=12)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--depths", default="0,1,2")
    ap.add_argument("--batch-songs", type=int, default=1,
                    help="songs per vmapped forward (same-bucket groups)")
    ap.add_argument("--workers", default="0",
                    help="comma list of host_workers values to sweep "
                         "(thread-pooled per-song scoring)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu import constants as C
    from reconvat_tpu.evaluate import (evaluate_wo_velocity,
                                       make_bucketed_runner)
    from reconvat_tpu.models.reconvat import ReconVAT

    model = ReconVAT(reconstruction=False, compute_dtype="bfloat16")
    variables = jax.device_put(model.init(jax.random.PRNGKey(0),
                                          seq_frames=args.frames))
    runner = make_bucketed_runner(model, variables)

    rng = np.random.RandomState(0)
    songs = []
    for i in range(args.songs):
        T = args.frames
        songs.append({
            "path": f"song{i}.flac",
            "audio": (rng.randn(T * C.HOP_LENGTH) * 0.1).astype(np.float32),
            "frame": (rng.rand(T, 88) > 0.9).astype(np.float32),
            "onset": (rng.rand(T, 88) > 0.97).astype(np.float32),
        })
    audio_s = args.songs * args.frames * C.HOP_LENGTH / C.SAMPLE_RATE

    # compile + host warmup
    g = args.batch_songs
    evaluate_wo_velocity(songs[:max(1, g)], runner, reconstruction=False,
                         batch_songs=g)

    print(f"# evaluate_wo_velocity, {args.songs} songs x {args.frames} "
          f"frames, batch_songs={g}, bf16, "
          f"device={jax.devices()[0].device_kind}")
    for depth in [int(d) for d in args.depths.split(",")]:
        for workers in [int(w) for w in args.workers.split(",")]:
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                evaluate_wo_velocity(songs, runner, reconstruction=False,
                                     pipeline=depth, batch_songs=g,
                                     host_workers=workers)
                best = min(best, time.perf_counter() - t0)
            print(f"  pipeline={depth} host_workers={workers}: "
                  f"{best / args.songs * 1e3:7.1f} ms/song"
                  f"  ({audio_s / best:7.0f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
