"""Roofline accounting for the flagship train step on the current backend.

AOT-compiles the semi-supervised bf16 VAT step and prints XLA's cost
analysis (FLOPs, HBM bytes accessed), the implied compute/bandwidth
rooflines, and peak HBM usage. Run on the TPU to ground the README
numbers in the TPU lowering (the CPU lowering overstates conv bytes).

    python tools/roofline.py [--batch 8] [--frames 640] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e (v5 lite) public specs; used only for the printed roofline estimate
PEAK = {"TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--infer", action="store_true",
                    help="account the transcribe forward (bench.py's "
                         "graph incl. threshold+bitpack; the discarded "
                         "reconstruction chain is DCE'd) instead of the "
                         "train step")
    ap.add_argument("--attn", default="xla",
                    help="attention impl for --infer (default xla: the "
                         "Pallas custom call is opaque to cost_analysis)")
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.train.state import create_train_state, make_train_step

    B, F = args.batch, args.frames
    rng = np.random.RandomState(0)

    def batch(seed):
        r = np.random.RandomState(seed)
        return {
            "audio": (r.randn(B, F * 512) * 0.1).astype(np.float32),
            "onset": (r.rand(B, F, 88) > 0.97).astype(np.float32),
            "offset": (r.rand(B, F, 88) > 0.97).astype(np.float32),
            "frame": (r.rand(B, F, 88) > 0.9).astype(np.float32),
            "velocity": r.rand(B, F, 88).astype(np.float32),
        }

    dtype = None if args.dtype in ("", "fp32", "float32") else args.dtype
    if args.infer:
        from reconvat_tpu.models.common import pack_roll_device

        model = ReconVAT(reconstruction=True, attn_impl=args.attn,
                         compute_dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), seq_frames=F)

        def fwd(variables, audio_i16):
            import jax.numpy as jnp

            audio = audio_i16.astype(jnp.float32) / 32768.0
            preds = model.transcribe(variables, audio)
            return pack_roll_device(preds["frame"])

        audio = (rng.randn(B, F * 512) * 3276.8).astype(np.int16)
        compiled = jax.jit(fwd).lower(variables, audio).compile()
    else:
        model = ReconVAT(reconstruction=True, compute_dtype=dtype)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   seq_frames=F)
        step = make_train_step(model, 1.0, vat=True, use_unlabeled=True)
        compiled = step.lower(state, batch(0), batch(1),
                              jax.random.PRNGKey(1)).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    dev = jax.devices()[0].device_kind
    print(f"device={dev} B={B} frames={F} dtype={args.dtype}")
    print(f"flops/step:          {flops / 1e12:.3f} TFLOP")
    print(f"bytes accessed/step: {byts / 1e9:.2f} GB")
    if byts:
        print(f"arithmetic intensity: {flops / byts:.1f} FLOP/byte")
    try:
        mem = compiled.memory_analysis()
        print(f"peak HBM (temp+args+output): "
              f"{(mem.temp_size_in_bytes + mem.argument_size_in_bytes + mem.output_size_in_bytes) / 1e9:.2f} GB "
              f"(temp {mem.temp_size_in_bytes / 1e9:.2f})")
    except Exception as e:  # memory_analysis is backend-dependent
        print(f"memory_analysis unavailable: {e}")
    peak = PEAK.get(dev)
    if peak and byts:
        t_flop = flops / (peak["bf16_tflops"] * 1e12) * 1e3
        t_bw = byts / (peak["hbm_gbps"] * 1e9) * 1e3
        print(f"rooflines: compute {t_flop:.1f} ms, bandwidth {t_bw:.1f} ms "
              f"-> {'bandwidth' if t_bw > t_flop else 'compute'}-bound")


if __name__ == "__main__":
    main()
