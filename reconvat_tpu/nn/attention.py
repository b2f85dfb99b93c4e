"""Local windowed multi-head self-attention, TPU-blocked.

Functionally equivalent to the reference `MutliHeadAttention1D`
(`model/self_attention.py:6-82`): window-31 attention where K/V come from a
zero-padded sequence, a learned relative-position embedding is added to K,
and energies are plain dot products (no 1/sqrt(d) scaling).

TPU-first implementation: instead of unfolding K/V into (B, L, F, W) windows
(a 31x memory blowup and a gather), the sequence is cut into time blocks and
each block does one dense (block, ctx) = (block, block + W - 1) MXU matmul
against its halo-extended context, with a banded mask. Memory is O(L * ctx)
and both contractions run on the MXU.
"""
from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def banded_attention_pallas(q, kpad, vpad, rel, window, block):
    """Pallas forward + XLA-differentiated backward (see
    ops/pallas_attention.py)."""
    from ..ops.pallas_attention import pallas_banded_forward

    return pallas_banded_forward(q, kpad, vpad, rel, window, block)


def _pallas_fwd(q, kpad, vpad, rel, window, block):
    out = banded_attention_pallas(q, kpad, vpad, rel, window, block)
    return out, (q, kpad, vpad, rel)


def _use_pallas_bwd() -> bool:
    """RECONVAT_PALLAS_BWD=1 switches the backward to the fused Pallas
    kernel ("0"/unset = XLA VJP of the banded formulation).

    Measured on the flagship semi-supervised VAT train step with
    device-resident inputs (tools/bench_train_step.py, B=8+8 x 640
    frames, TPU v5 lite, folded production layout,
    bench_logs/r4_attn_matrix_folded.log): the Pallas backward is the
    slowest combination at both precisions — bf16 67.3 / 67.8 / 70.1 ms
    for xla / pallas-fwd / pallas-fwd+bwd, fp32 89.0 / 93.8 / 94.8 ms.
    The default backward therefore stays the XLA VJP: faster, keeps
    probs available, and GSPMD-shardable. (Under the retired nhwc
    layout all combinations were within +-1.5% because the 3.2x-slower
    step was HBM-bound in the unfolded convolutions; and a
    per-step-H2D regime shows large spurious Pallas "wins" — 1048 vs
    639 ms bf16 — that measure transfer overlap through the dev relay,
    not the kernels; see tools/bench_train_step.py --h2d.)
    """
    flag = os.environ.get("RECONVAT_PALLAS_BWD")
    return bool(flag) and flag != "0"


def _pallas_bwd(window, block, residuals, g):
    q, kpad, vpad, rel = residuals

    if _use_pallas_bwd():
        from ..ops.pallas_attention_bwd import pallas_banded_backward

        dq, dk, dv, drel = pallas_banded_backward(q, kpad, vpad, rel, g,
                                                  window, block)
        if drel is None:
            drel = jnp.zeros_like(rel)
        return dq, dk, dv, drel

    def ref_fn(q_, k_, v_, r_):
        out, _ = banded_attention(q_, k_, v_, r_, window,
                                  block_size=min(block, 128),
                                  return_probs=False)
        return out

    _, vjp = jax.vjp(ref_fn, q, kpad, vpad, rel)
    return vjp(g)


banded_attention_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def resolve_attn_impl(impl: str) -> str:
    """Resolve the 'auto' attention implementation.

    'auto' = the XLA banded-block einsum formulation everywhere — a
    *measured* decision, re-taken under the frequency-folded U-Net layout
    that is now the TPU production default (the r2 measurements that
    briefly favored the Pallas forward were taken under the retired nhwc
    layout, where a 3.2x-slower step buried the difference). On the
    folded flagship VAT train step XLA wins or ties every Pallas
    combination: bf16 67.3 vs 67.8 / 70.1 ms, fp32 89.0 vs 93.8 / 94.8
    (xla vs pallas-fwd / pallas-fwd+bwd; bench_logs/
    r4_attn_matrix_folded.log). On end-to-end inference the interleaved
    same-process A/B is a tie within noise — 23.53 vs 23.59 ms/batch
    median (tools/bench_attn_infer_ab.py; bench_logs/
    r4_attn_infer_ab.log; earlier cross-process "wins" in either
    direction were relay drift). XLA is also the impl that shards
    under GSPMD meshes (the Pallas call is opaque to the sequence-halo
    partitioner) and the only one that runs compiled on CPU. The Pallas
    kernel pair stays available via attn_impl='pallas' (+
    RECONVAT_PALLAS_BWD=1 for the backward) and is parity-tested
    on-chip to <=6e-7.
    """
    if impl != "auto":
        return impl
    return "xla"


def banded_attention(q, kpad, vpad, rel, window: int, block_size: int = 128,
                     return_probs: bool = True,
                     precision=None, seq_major: bool = True):
    """Banded local attention core.

    q:    (B, L, H, Dh)
    kpad: (B, L + window - 1, H, Dh) — keys, zero-padded (window-1)//2 per side
    vpad: same shape as kpad — values with identical padding
    rel:  (H, Dh, window) relative position embedding added to K, or None

    Returns (out (B, L, H, Dh), probs (B, L, H, window) or None).

    seq_major=False builds the halo context stacks head-major
    (B, nb, H, ctx, Dh): einsum-operand order, and the H=1 head axis is
    never a tile-padded penultimate dim. Tile-aware HLO accounting
    (`tools/hlo_bytes.py`, bench_logs/r5_serve_hlo_bytes_before.log)
    flagged the seq-major stacks as 8x sublane-padded, but the on-chip
    A/B measured a TIE both ways — serve 59.9 vs 59.5 ms, train step
    65.8 vs 65.6 ms (bench_logs/r5_attn_layout_{serve,train}_ab.log):
    XLA never moves the padding. Both layouts are bit-identical
    (tests/test_attn_layout.py); default stays the established
    seq-major formulation.
    """
    B, L, H, Dh = q.shape
    if precision is None:
        # fp32 inputs keep exact-parity matmuls; low-precision inputs
        # (mixed-precision mode) use the fast MXU path
        precision = (jax.lax.Precision.HIGHEST
                     if q.dtype == jnp.float32 else
                     jax.lax.Precision.DEFAULT)
    W = window
    hw = (W - 1) // 2
    bs = min(block_size, max(8, L))
    nb = _cdiv(L, bs)
    Lp = nb * bs
    ctx = bs + 2 * hw

    qb = jnp.pad(q, ((0, 0), (0, Lp - L), (0, 0), (0, 0)))
    qb = qb.reshape(B, nb, bs, H, Dh)
    kp = jnp.pad(kpad, ((0, 0), (0, Lp - L), (0, 0), (0, 0)))
    vp = jnp.pad(vpad, ((0, 0), (0, Lp - L), (0, 0), (0, 0)))
    if not seq_major:
        qb = qb.transpose(0, 1, 3, 2, 4)     # (B, nb, H, bs, Dh)
        kp = kp.transpose(0, 2, 1, 3)        # (B, H, Lp + 2*hw, Dh)
        vp = vp.transpose(0, 2, 1, 3)
        seq_axis, q_spec, ctx_spec, out_spec = 2, "bnhqd", "bnhkd", "bnhqd"
    else:
        seq_axis, q_spec, ctx_spec, out_spec = 1, "bnqhd", "bnkhd", "bnqhd"

    # halo-extended context blocks: block i sees [i*bs, i*bs + ctx)
    kctx = jnp.stack([jax.lax.slice_in_dim(kp, i * bs, i * bs + ctx,
                                           axis=seq_axis)
                      for i in range(nb)], axis=1)   # (B, nb, [H,] ctx, ...)
    vctx = jnp.stack([jax.lax.slice_in_dim(vp, i * bs, i * bs + ctx,
                                           axis=seq_axis)
                      for i in range(nb)], axis=1)

    scores = jnp.einsum(f"{q_spec},{ctx_spec}->bnhqk", qb, kctx,
                        precision=precision)

    rows = np.arange(bs)[:, None]
    cols = np.arange(ctx)[None, :]
    offs = cols - rows                       # window offset j = col - row
    band = (offs >= 0) & (offs < W)
    # one-hot band selector (W, bs, ctx): spreads per-offset values onto
    # the (row, row + j) diagonal band as a matmul — no take_along_axis
    # gather, whose scatter-add transpose forces SPMD rematerialization
    # under sequence sharding.
    band_onehot = jnp.asarray(
        (offs[None] == np.arange(W)[:, None, None]).astype(np.float32))

    if rel is not None:
        qrel = jnp.einsum(f"{q_spec},hdw->bnhqw", qb, rel,
                          precision=precision)
        bias = jnp.einsum("bnhqw,wqk->bnhqk", qrel, band_onehot,
                          precision=precision)
        scores = scores + bias

    scores = jnp.where(jnp.asarray(band)[None, None, None], scores,
                       -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs.astype(vctx.dtype)

    out = jnp.einsum(f"bnhqk,{ctx_spec}->{out_spec}", probs, vctx,
                     precision=precision)
    if not seq_major:
        out = out.transpose(0, 1, 3, 2, 4)   # back to (B, nb, bs, H, Dh)
    out = out.reshape(B, Lp, H, Dh)[:, :L]

    attn = None
    if return_probs:
        # extract the (row, row+j) band back into (B, L, H, W)
        attn = jnp.einsum("bnhqk,wqk->bnqhw", probs, band_onehot,
                          precision=precision)
        attn = attn.reshape(B, Lp, H, W)[:, :L]
    return out, attn


class MultiHeadAttention1D(nn.Module):
    """Drop-in counterpart of reference `MutliHeadAttention1D`.

    Input (B, L, in_features) -> (out (B, L, out_features),
    attention (B, L, groups, kernel_size)).
    """
    out_features: int
    kernel_size: int = 31
    groups: int = 1
    position: bool = True
    use_bias: bool = False
    block_size: int = 128
    return_probs: bool = True
    impl: str = "xla"          # 'xla' | 'pallas' (fused kernel, probs=None)
                               # | 'auto' (= xla, see resolve_attn_impl)
    pallas_block: int = 256
    dtype: str | None = None   # computation dtype; params stay fp32

    def setup(self):
        assert self.out_features % self.groups == 0
        assert (self.kernel_size - 1) % 2 == 0, "kernel size must be odd"
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        self.W_k = nn.Dense(self.out_features, use_bias=self.use_bias,
                            kernel_init=kaiming, dtype=self.dtype)
        self.W_q = nn.Dense(self.out_features, use_bias=self.use_bias,
                            kernel_init=kaiming, dtype=self.dtype)
        self.W_v = nn.Dense(self.out_features, use_bias=self.use_bias,
                            kernel_init=kaiming, dtype=self.dtype)
        if self.position:
            self.rel = self.param(
                "rel", nn.initializers.normal(1.0),
                (1, self.out_features, self.kernel_size))

    def __call__(self, x):
        B, L, _ = x.shape
        H = self.groups
        Dh = self.out_features // H
        hw = (self.kernel_size - 1) // 2

        # K/V from the zero-padded sequence (reference pads x before the
        # bias-free projections, `model/self_attention.py:44-47`).
        xpad = jnp.pad(x, ((0, 0), (hw, hw), (0, 0)))
        q = self.W_q(x).reshape(B, L, H, Dh)
        k = self.W_k(xpad).reshape(B, L + 2 * hw, H, Dh)
        v = self.W_v(xpad).reshape(B, L + 2 * hw, H, Dh)

        rel = None
        if self.position:
            rel = self.rel[0].reshape(H, Dh, self.kernel_size)

        if resolve_attn_impl(self.impl) == "pallas":
            if rel is None:
                rel = jnp.zeros((H, Dh, self.kernel_size), q.dtype)
            out = banded_attention_pallas(q, k, v, rel, self.kernel_size,
                                          self.pallas_block)
            return out.reshape(B, L, self.out_features), None

        # RECONVAT_ATTN_LAYOUT=head opts into the head-major context
        # stacks (measured tie vs the default, see banded_attention;
        # read at trace time)
        seq_major = os.environ.get("RECONVAT_ATTN_LAYOUT", "seq") != "head"
        out, attn = banded_attention(q, k, v, rel, self.kernel_size,
                                     self.block_size, self.return_probs,
                                     seq_major=seq_major)
        out = out.reshape(B, L, self.out_features)
        if attn is None:
            return out, None
        return out, attn
