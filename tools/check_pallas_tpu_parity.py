"""Numerical parity of the COMPILED (Mosaic) Pallas kernels vs the XLA
formulation, on the real TPU. The pytest suite runs the kernels in
interpret mode on CPU; this check catches Mosaic-lowering divergences
(e.g. in the strided rotate) that interpret mode cannot.

    python tools/check_pallas_tpu_parity.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from reconvat_tpu import runtime
from reconvat_tpu.nn.attention import banded_attention
from reconvat_tpu.ops.pallas_attention import pallas_banded_forward
from reconvat_tpu.ops.pallas_attention_bwd import pallas_banded_backward

runtime.setup()
assert jax.default_backend() == "tpu", "run on the TPU chip"

ok = True
for (B, L, H, Dh, W) in [(2, 640, 4, 229, 31), (1, 100, 2, 64, 9),
                         (2, 640, 6, 128, 31)]:
    hw = (W - 1) // 2
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(B, L + 2 * hw, H, Dh), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(B, L + 2 * hw, H, Dh), jnp.float32) * 0.3
    rel = jnp.asarray(rng.randn(H, Dh, W), jnp.float32) * 0.3
    g = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32)

    ref_out, _ = jax.jit(lambda a, b, c, d: banded_attention(
        a, b, c, d, W, 128, return_probs=False))(q, k, v, rel)
    pl_out = jax.jit(lambda a, b, c, d: pallas_banded_forward(
        a, b, c, d, W, 256))(q, k, v, rel)
    fwd_err = float(jnp.max(jnp.abs(ref_out - pl_out)))

    def ref_fn(a, b, c, d):
        out, _ = banded_attention(a, b, c, d, W, 128, return_probs=False)
        return jnp.vdot(out, g)

    ref_grads = jax.jit(jax.grad(ref_fn, argnums=(0, 1, 2, 3)))(q, k, v, rel)
    pl_grads = jax.jit(lambda a, b, c, d: pallas_banded_backward(
        a, b, c, d, g, W, 256))(q, k, v, rel)
    names = ["dq", "dk", "dv", "drel"]
    errs = {n: float(jnp.max(jnp.abs(r - p)))
            for n, r, p in zip(names, ref_grads, pl_grads)}
    scale = {n: float(jnp.max(jnp.abs(r))) for n, r in zip(names, ref_grads)}
    rel_errs = {n: errs[n] / max(scale[n], 1e-6) for n in names}
    worst = max(rel_errs.values())
    line_ok = fwd_err < 2e-4 and worst < 2e-4
    ok &= line_ok
    print(f"B={B} L={L} H={H} Dh={Dh} W={W}: fwd max|err|={fwd_err:.2e} "
          f"bwd rel errs={ {n: f'{e:.2e}' for n, e in rel_errs.items()} } "
          f"{'OK' if line_ok else 'FAIL'}")

print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
