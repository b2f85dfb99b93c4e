"""Rank optimized-HLO instructions by (tile-padded) HBM bytes accessed.

AOT-compiles the flagship train step (or the bench transcribe graph with
--infer) on the current backend, parses the post-optimization HLO text,
and prints the top instructions by operand+output bytes, aggregated by
op kind and by source line. Byte sizes honor the TPU tiled layout
annotations (`{3,2,1,0:T(8,128)(2,1)}`), so layout padding blowups (e.g.
a 16-channel minor dim padded to 128 lanes) are visible — XLA's
`cost_analysis()` reports only the aggregate.

    python tools/hlo_bytes.py [--infer] [--batch 8] [--frames 640]
                              [--dtype bfloat16] [--top 40]
"""
from __future__ import annotations

import argparse
import collections
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f16": 2, "bf16": 2, "f32": 4, "f64": 8,
    "c64": 8, "c128": 16, "u4": 1, "s4": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(
    r"(?P<dt>[a-z0-9]+)\[(?P<dims>[0-9,]*)\]"
    r"(?:\{(?P<layout>[^}]*)\})?")


def shape_bytes(text: str, tiled: bool = True) -> int:
    """Bytes of one (possibly tuple) shape string, honoring tile padding."""
    total = 0
    for m in _SHAPE_RE.finditer(text):
        dt = m.group("dt")
        if dt not in DTYPE_BYTES:
            continue
        esize = DTYPE_BYTES[dt]
        dims = [int(d) for d in m.group("dims").split(",") if d]
        if not dims:
            total += esize
            continue
        layout = m.group("layout") or ""
        tile_m = re.search(r"T\((\d+),(\d+)\)", layout)
        if tiled and tile_m and dims:
            order = [int(x) for x in
                     re.match(r"([0-9,]+)", layout).group(1).split(",")]
            sub, lane = int(tile_m.group(1)), int(tile_m.group(2))
            # packed low-precision types tile 2x/4x in the sublane dim
            pack = max(1, 4 // esize)
            padded = list(dims)
            minor = order[0]
            padded[minor] = math.ceil(padded[minor] / lane) * lane
            if len(order) > 1:
                second = order[1]
                eff_sub = sub * pack
                padded[second] = math.ceil(padded[second] / eff_sub) * eff_sub
            total += int(np.prod(padded)) * esize
        else:
            total += int(np.prod(dims)) * esize
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?(?P<name>[\w.\-]+)\s*=\s*(?P<shape>\([^=]*?\)|\S+)\s+"
    r"(?P<op>[\w\-]+)\((?P<args>.*)$")


def analyze(hlo_text: str, top: int = 40, tiled: bool = True):
    # name -> output bytes, for operand lookups across all computations
    out_bytes: dict[str, int] = {}
    lines = hlo_text.splitlines()
    for ln in lines:
        m = _INSTR_RE.match(ln)
        if m:
            out_bytes[m.group("name")] = shape_bytes(m.group("shape"), tiled)

    # walk the entry computation only (fusions count as one instruction:
    # their operands + output are the HBM traffic; interiors stay fused)
    entry, depth, in_entry = [], 0, False
    for ln in lines:
        if ln.startswith("ENTRY"):
            in_entry = True
        if in_entry:
            entry.append(ln)
            depth += ln.count("{") - ln.count("}")
            if depth <= 0 and len(entry) > 1:
                break

    skip_ops = {"parameter", "constant", "tuple", "get-tuple-element",
                "bitcast", "after-all"}
    rows = []
    per_op = collections.Counter()
    per_meta = collections.Counter()
    total = 0
    for ln in entry:
        m = _INSTR_RE.match(ln)
        if not m or m.group("op") in skip_ops:
            continue
        name, op = m.group("name"), m.group("op")
        b = shape_bytes(m.group("shape"), tiled)
        for opnd in re.findall(r"%([\w.\-]+)", m.group("args")):
            b += out_bytes.get(opnd, 0)
        meta = ""
        mm = re.search(r'op_name="([^"]+)"', ln)
        if mm:
            meta = mm.group(1)
        kind = re.search(r"kind=(\w+)", ln)
        label = f"{op}({kind.group(1)})" if kind else op
        rows.append((b, name, label, meta))
        per_op[label] += b
        # collapse jit scope indices so repeated layers aggregate
        per_meta[re.sub(r"\d+", "#", meta.rsplit("/", 1)[-1] if meta
                        else "?")] += b
        total += b

    rows.sort(reverse=True)
    print(f"total bytes accessed (entry, tile-padded): {total / 1e9:.2f} GB")
    print(f"\n== top {top} instructions ==")
    for b, name, label, meta in rows[:top]:
        print(f"{b / 1e6:10.1f} MB  {label:22s} {name:28s} {meta[-90:]}")
    print("\n== by op kind ==")
    for k, v in per_op.most_common(25):
        print(f"{v / 1e9:8.2f} GB  {k}")
    print("\n== by (digit-collapsed) op_name leaf ==")
    for k, v in per_meta.most_common(25):
        print(f"{v / 1e9:8.2f} GB  {k[-100:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--attn", default="xla")
    ap.add_argument("--layout", default="auto",
                    help="U-Net conv layout: auto|folded|nhwc")
    ap.add_argument("--infer", action="store_true")
    ap.add_argument("--model", default="reconvat",
                    help="reconvat|prestack (train-step graph)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logical", action="store_true",
                    help="ignore tile padding (logical bytes)")
    ap.add_argument("--dump", default="",
                    help="also write the optimized HLO text here")
    args = ap.parse_args()

    import jax

    from reconvat_tpu import runtime
    runtime.setup()

    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.train.state import create_train_state, make_train_step

    B, F = args.batch, args.frames
    dtype = None if args.dtype in ("", "fp32", "float32") else args.dtype

    if args.infer:
        import jax.numpy as jnp

        from reconvat_tpu.models.common import pack_roll_device

        model = ReconVAT(reconstruction=True, attn_impl=args.attn,
                         compute_dtype=dtype, conv_layout=args.layout)
        variables = model.init(jax.random.PRNGKey(0), seq_frames=F)

        def fwd(variables, audio_i16):
            audio = audio_i16.astype(jnp.float32) / 32768.0
            return pack_roll_device(
                model.transcribe(variables, audio)["frame"])

        audio = (np.random.RandomState(0).randn(B, F * 512)
                 * 3276.8).astype(np.int16)
        compiled = jax.jit(fwd).lower(variables, audio).compile()
    else:
        def batch(seed):
            r = np.random.RandomState(seed)
            return {
                "audio": (r.randn(B, F * 512) * 0.1).astype(np.float32),
                "onset": (r.rand(B, F, 88) > 0.97).astype(np.float32),
                "offset": (r.rand(B, F, 88) > 0.97).astype(np.float32),
                "frame": (r.rand(B, F, 88) > 0.9).astype(np.float32),
                "velocity": r.rand(B, F, 88).astype(np.float32),
            }

        if args.model == "prestack":
            from reconvat_tpu.models.prestack import Prestack

            model = Prestack(compute_dtype=dtype)
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       seq_frames=F)
            step = make_train_step(model, 1.0, vat=False,
                                   use_unlabeled=False)
            compiled = step.lower(state, batch(0), None,
                                  jax.random.PRNGKey(1)).compile()
        else:
            model = ReconVAT(reconstruction=True, attn_impl=args.attn,
                             compute_dtype=dtype, conv_layout=args.layout)
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       seq_frames=F)
            step = make_train_step(model, 1.0, vat=True, use_unlabeled=True)
            compiled = step.lower(state, batch(0), batch(1),
                                  jax.random.PRNGKey(1)).compile()

    text = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"cost_analysis: {ca.get('flops', 0) / 1e12:.3f} TFLOP, "
          f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")
    analyze(text, args.top, tiled=not args.logical)


if __name__ == "__main__":
    main()
