"""U-Net encoder/decoder blocks (flax), with a TPU frequency-folded layout.

Structure mirrors the reference U-Net (`model/self_attention_VAT.py:844-926`):
residual double-conv encoder blocks with 1x1 skip and strided downsampling,
transpose-conv decoder blocks whose upsampler is driven to an explicit
target size (PyTorch `output_size=` semantics). Submodule names match the
reference state_dict names so released torch weights convert mechanically.

Two computation layouts over the same parameter tree:

- ``nhwc``: activations (batch, time, freq, channels) — the straightforward
  TPU conv layout. On TPU the 1/16/32-channel minor dims of the full- and
  half-resolution levels are tile-padded to 128 lanes (and the batch
  sublane dim to 16 under bf16 packing), a measured ~8-16x HBM byte
  blowup that makes these convs the dominant cost of the train step
  (tools/hlo_bytes.py).

- ``folded``: frequency is space-to-depth folded into channels so every
  level presents ~128 lanes to the MXU: level 1 folds k=8 (16ch -> 128),
  level 2 k=4 (32 -> 128), level 3 k=2 (64 -> 128), level 4 unfolded.
  The 3x3/2x2/1x1 kernels are scattered into folded kernels built from
  the *same logical parameters* at trace time, so the state dict and
  weight conversion are untouched. MACs rise k-fold on the folded convs
  (the step is bandwidth-bound, compute is nearly free) while HBM bytes
  drop ~6.5x (measured: tools/bench_folded_conv.py — 3.0x faster on the
  representative level-1 block). Frequency sizes that don't divide k
  carry zeroed padding bins; those bins double as the conv zero-padding,
  and torch's transpose-conv `output_padding` rows emerge naturally as
  taps that read only zeroed carry bins. BatchNorm statistics mask the
  carry bins and normalize by the true bin count.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax.linen.dtypes import promote_dtype

BATCHNORM_MOMENTUM = 0.1  # torch convention; flax momentum = 1 - this

# torch default Conv2d/Linear init: kaiming_uniform(a=sqrt(5)) ==
# Uniform(+-sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                   "uniform")


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def resolve_conv_layout(layout: str) -> str:
    """Resolve the 'auto' U-Net computation layout.

    TPU: 'folded' (the measured ~3x byte win; tile padding of small
    channel dims is a TPU lane phenomenon). CPU/GPU: 'nhwc' — Eigen/
    cuDNN pay the folded path's k-fold extra MACs for nothing.
    `RECONVAT_UNET_LAYOUT` overrides.
    """
    import os

    env = os.environ.get("RECONVAT_UNET_LAYOUT")
    resolved = layout if layout != "auto" else (
        env or ("folded" if jax.default_backend() == "tpu" else "nhwc"))
    if resolved not in ("folded", "nhwc"):
        raise ValueError(
            f"unknown U-Net layout {resolved!r} (from "
            f"{'RECONVAT_UNET_LAYOUT' if layout == 'auto' and env else 'conv_layout'}): "
            "expected 'auto', 'folded' or 'nhwc'")
    return resolved


# ---------------------------------------------------------------------------
# frequency folding
# ---------------------------------------------------------------------------

class FoldSpec:
    """Folding bookkeeping for one U-Net resolution level.

    ``F`` logical frequency bins are carried as ``blocks`` folded positions
    of ``k`` bins each (``carried = blocks*k >= F``); a folded tensor has
    shape (B, T, blocks, k*C) with channel index ``jj*C + c``. Carry bins
    (``F <= bin < carried``) are kept at zero between ops so the folded
    3-tap convs read them as the original conv's zero padding.
    """

    def __init__(self, F: int, k: int):
        self.F, self.k = int(F), int(k)
        self.blocks = -(-self.F // self.k)
        self.carried = self.blocks * self.k

    @property
    def has_pad(self) -> bool:
        return self.carried != self.F

    def fold3(self, x):
        """(B, T, F) -> (B, T, blocks, k), zero-padding the carry bins."""
        B, T, F = x.shape
        assert F == self.F, (F, self.F)
        if self.has_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, self.carried - F)))
        return x.reshape(B, T, self.blocks, self.k)

    def mask_mul(self, xf):
        """Zero the carry bins of a folded (B, T, blocks, k*C) tensor."""
        if not self.has_pad:
            return xf
        C = xf.shape[-1] // self.k
        m = np.zeros((self.carried,), np.float32)
        m[:self.F] = 1.0
        m = np.repeat(m.reshape(self.blocks, self.k), C, axis=1)
        return xf * jnp.asarray(m.reshape(1, 1, self.blocks, self.k * C),
                                xf.dtype)


def unet_fold_specs(F: int):
    """FoldSpecs for the four encoder levels of the (2,2)-strided U-Net.

    Level channel widths are 16/32/64/128 (`model/self_attention_VAT.py:
    884-906`), so folds of 8/4/2/1 present exactly 128 lanes per level.
    """
    specs, k = [], 8
    for _ in range(4):
        specs.append(FoldSpec(F, k))
        F = (F - 2) // 2 + 1
        k = max(1, k // 2)
    return specs


def unfold_channels(yf, fs: FoldSpec, n_ch: int):
    """Folded decoder output (B, T, blocks, k*n_ch) -> n_ch (B, T, F) maps.

    Goes straight to 3-D per-channel tensors: a (B, T, F, n_ch) NHWC
    intermediate would re-materialize with its tiny channel dim padded to
    128 lanes — the layout cost the folded path exists to avoid.
    """
    B, T, bl, kc = yf.shape
    assert kc == fs.k * n_ch, (kc, fs.k, n_ch)
    flat = yf.reshape(B, T, bl * kc)
    if n_ch == 1:
        return [flat[:, :, :fs.F]]
    return [jax.lax.slice(flat, (0, 0, i), (B, T, bl * kc), (1, 1, n_ch))
            [:, :, :fs.F] for i in range(n_ch)]


def _fold_conv_idx(kw: int, k_in: int, stride: int, pad: int):
    """Constant tap-index map for `fold_conv_kernel`.

    idx[t, ii, jj] = the kernel freq tap df whose weight lands at folded
    freq tap t, input channel block ii, output channel block jj — or
    `kw` (a sentinel zero column) where no tap lands. Host-side numpy:
    the map depends only on static geometry, so building it here keeps
    the traced graph to ONE gather instead of an O(k_out*kw) chain of
    dynamic-update-slices (which made the folded layout's XLA compile
    ~4.5x slower than nhwc's).
    """
    k_out = k_in // stride
    offs = [stride * jj + df - pad
            for jj in range(k_out) for df in range(kw)]
    dj_min = min(o // k_in for o in offs)
    dj_max = max(o // k_in for o in offs)
    taps = dj_max - dj_min + 1
    idx = np.full((taps, k_in, k_out), kw, np.int32)
    for jj in range(k_out):
        for df in range(kw):
            dj, ii = divmod(stride * jj + df - pad, k_in)
            idx[dj - dj_min, ii, jj] = df
    return idx, -dj_min


def _take_fold(Khwio, idx, k_in: int, k_out: int):
    """Gather (kh, kw, Ci, Co) kernel taps into the folded layout
    (kh, taps, k_in*Ci, k_out*Co) via one constant-index take (VJP: one
    scatter-add). Index `kw` selects an appended zero column."""
    kh, kw, ci, co = Khwio.shape
    taps = idx.shape[0]
    Kz = jnp.concatenate(
        [Khwio, jnp.zeros((kh, 1, ci, co), Khwio.dtype)], axis=1)
    Kf = jnp.take(Kz, jnp.asarray(idx.reshape(-1)), axis=1)
    Kf = Kf.reshape(kh, taps, k_in, k_out, ci, co)
    return Kf.transpose(0, 1, 2, 4, 3, 5).reshape(
        kh, taps, k_in * ci, k_out * co)


def fold_conv_kernel(K, k_in: int, stride: int, pad: int):
    """General folded conv kernel scatter.

    (kh, kw, Ci, Co) -> (kh, taps, k_in*Ci, k_out*Co) with
    k_out = k_in // stride: a freq conv with input fold k_in, freq
    stride, and symmetric-left freq zero padding `pad` becomes a
    stride-1 conv over the folded-blocks axis. Output in-block position
    jj with kernel freq tap df reads logical input bin
    q = stride*jj + df - pad = dj*k_in + ii relative to the output
    block's base; the gather places K[:, df] at folded freq tap
    (dj - dj_min), input channel block ii, output channel block jj.

    Returns (Kf, pad_left_blocks) where pad_left_blocks = -dj_min is
    the zero-block padding the folded conv needs on the low-freq side
    (the high side is sized by the caller from the target block count).
    """
    kh, kw, ci, co = K.shape
    assert k_in % stride == 0, (k_in, stride)
    idx, pl = _fold_conv_idx(kw, k_in, stride, pad)
    return _take_fold(K, idx, k_in, k_in // stride), pl


def _fold_convT_idx(kw: int, k_in: int, stride: int):
    """Constant tap-index map for `fold_convT_kernel` (see
    `_fold_conv_idx` for why this is host-side numpy)."""
    k_out = stride * k_in
    pairs = [(mm, df) for mm in range(k_out) for df in range(kw)
             if (mm - df) % stride == 0]
    rels = [(mm - df) // stride for mm, df in pairs]
    dj_min = min(r // k_in for r in rels)
    dj_max = max(r // k_in for r in rels)
    taps = dj_max - dj_min + 1
    idx = np.full((taps, k_in, k_out), kw, np.int32)
    for mm, df in pairs:
        dj, ii = divmod((mm - df) // stride, k_in)
        idx[dj - dj_min, ii, mm] = df
    return idx, -dj_min


def fold_convT_kernel(K_hwoi, k_in: int, stride: int):
    """General folded transpose-conv kernel scatter (freq axis).

    (kh, kw, Co, Ci) torch-HWOI transpose kernel -> (kh, taps,
    k_in*Ci, k_out*Co) with k_out = stride*k_in, for use in a conv whose
    time axis is the usual lhs-dilated flipped-kernel correlation (the
    time axis of Kf is flipped here; the caller passes lhs_dilation on
    time only). Freq transpose semantics: raw out bin m receives
    x[j]*K[df] for m = stride*j + df, i.e. in-block out position mm with
    tap df reads logical input bin rel = (mm - df)/stride when integral.
    Left crops of the raw output must be zero (true for stride-2 TF-SAME
    trimming and torch output_size resolution — asserted by callers);
    right crops fall into masked carry bins.

    Returns (Kf, pad_left_blocks).
    """
    kh, kw, co, ci = K_hwoi.shape
    # flip the (genuinely transposed) time axis; channels to (Ci, Co)
    Kcols = jnp.transpose(K_hwoi[::-1], (0, 1, 3, 2))
    idx, pl = _fold_convT_idx(kw, k_in, stride)
    return _take_fold(Kcols, idx, k_in, stride * k_in), pl


def _fold_kernel_3tap(K, fold: int):
    """3x3 stride-1 pad-1 conv kernel, folded (fold_conv_kernel case)."""
    Kf, pl = fold_conv_kernel(K, fold, 1, 1)
    assert pl == 1 and Kf.shape[1] == 3
    return Kf


def _fold_kernel_1x1(K, fold: int):
    """1x1 conv kernel -> block-diagonal (fold_conv_kernel case)."""
    Kf, pl = fold_conv_kernel(K, fold, 1, 0)
    assert pl == 0 and Kf.shape[1] == 1
    return Kf


def _fold_kernel_ds2(K, fold_in: int):
    """2x2-stride-2 downsampler: the freq stride becomes a pure channel
    contraction (fold_conv_kernel case)."""
    assert K.shape[1] == 2 and fold_in >= 2
    Kf, pl = fold_conv_kernel(K, fold_in, 2, 0)
    assert pl == 0 and Kf.shape[1] == 1
    return Kf


def _fold_kernel_us2(K_hwoi, fold_in: int):
    """2x2-stride-2 upsampler (fold_convT_kernel case): out fold
    position mm reads in position mm//2 with freq tap mm%2."""
    assert K_hwoi.shape[0] == 2 and K_hwoi.shape[1] == 2
    Kf, pl = fold_convT_kernel(K_hwoi, fold_in, 2)
    assert pl == 0 and Kf.shape[1] == 1
    return Kf


def refold(xf, fs_from: FoldSpec, fs_to: FoldSpec):
    """Merge adjacent folded blocks into a coarser fold (pure reshape).

    After a stride-2 folded downsampler the fold halves (k_out = k//2);
    when the channel width did not double to compensate (Segmentation's
    32->32 level-1 blocks), re-fold block pairs back up so the level
    keeps presenting >=128 lanes. Valid whenever both specs carry the
    same bins: (B, T, bl, k*C) -> (B, T, bl/f, f*k*C) maps folded index
    (b, jj) to (b//f, (b%f)*k + jj) = the fs_to convention exactly.
    """
    assert (fs_to.k % fs_from.k == 0 and fs_from.F == fs_to.F
            and fs_to.carried >= fs_from.carried), (fs_from.__dict__,
                                                    fs_to.__dict__)
    f = fs_to.k // fs_from.k
    B, T, bl, kc = xf.shape
    assert bl == fs_from.blocks
    extra = (fs_to.carried - fs_from.carried) // fs_from.k
    if extra:  # new carry blocks (zero == masked carry by construction)
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, extra), (0, 0)))
        bl += extra
    assert bl % f == 0
    return xf.reshape(B, T, bl // f, f * kc)


def fold_concat(a, b, fs: FoldSpec):
    """Channel-concat two folded tensors (interleaves per fold position)."""
    B, T, bl, _ = a.shape
    a5 = a.reshape(B, T, bl, fs.k, -1)
    b5 = b.reshape(B, T, bl, fs.k, -1)
    return jnp.concatenate([a5, b5], axis=-1).reshape(B, T, bl, -1)


# ---------------------------------------------------------------------------
# parameter-compatible conv / BN modules
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


class TorchConv(nn.Module):
    """nn.Conv-compatible conv (identical param tree: kernel HWIO + bias)
    with optional frequency-folded application modes."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, fold_mode: str | None = None,
                 fold: FoldSpec | None = None,
                 fold_out: FoldSpec | None = None, f_pad: int = 0):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        ci = x.shape[-1] if fold is None else x.shape[-1] // fold.k
        kernel = self.param("kernel", torch_conv_init,
                            (kh, kw, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if fold_mode is None:
            rhs, pad = kernel, [(ph, ph), (pw, pw)]
            strides, tile = (sh, sw), 1
        elif fold_mode == "band3":        # 3x3 stride-1 pad-1
            assert (kh, kw, sh, sw, pw) == (3, 3, 1, 1, 1)
            rhs, pad = _fold_kernel_3tap(kernel, fold.k), [(1, 1), (1, 1)]
            strides, tile = (1, 1), fold.k
        elif fold_mode == "diag":         # 1x1
            assert (kh, kw) == (1, 1)
            rhs, pad = _fold_kernel_1x1(kernel, fold.k), [(0, 0), (0, 0)]
            strides, tile = (1, 1), fold.k
        elif fold_mode == "ds2":          # 2x2 stride-2 downsampler
            assert (kh, kw, sh, sw) == (2, 2, 2, 2)
            rhs, pad = _fold_kernel_ds2(kernel, fold.k), [(0, 0), (0, 0)]
            strides, tile = (2, 1), fold.k // 2
        elif fold_mode == "gen":
            # general folded freq conv: freq stride sw and explicit freq
            # left-pad `f_pad` are absorbed into the kernel scatter; the
            # time axis keeps stride sh with the caller's external pad
            # (TF-SAME asymmetric pads live outside, so ph must be 0).
            assert ph == 0 and fold is not None and fold_out is not None
            assert fold.k % sw == 0 and fold_out.k == fold.k // sw
            rhs, pl = fold_conv_kernel(kernel, fold.k, sw, f_pad)
            pr = fold_out.blocks - x.shape[2] + rhs.shape[1] - 1 - pl
            assert pr >= 0, (fold_out.blocks, x.shape, rhs.shape, pl)
            pad = [(0, 0), (pl, pr)]
            strides, tile = (sh, 1), fold_out.k
        else:
            raise ValueError(fold_mode)

        x, rhs, bias = promote_dtype(x, rhs, bias, dtype=self.dtype)
        out = jax.lax.conv_general_dilated(
            x, rhs, window_strides=strides, padding=pad,
            dimension_numbers=_DN)
        return out + (jnp.tile(bias, tile) if tile > 1 else bias)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch semantics incl. `output_size` resolution.

    Kernel stored as (kh, kw, out_ch, in_ch) — the HWOI view of torch's
    (in, out, kh, kw) — so weight conversion is a pure transpose. Folded
    modes: 'band3t' (3x3 stride-1 pad-1, same spatial footprint as a
    conv) and 'us2' (2x2 stride-2 upsampler; the freq upsample becomes a
    fold-channel expansion, and torch `output_padding` rows come out as
    taps reading only zeroed carry bins).
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    use_bias: bool = True
    dtype: str | None = None   # computation dtype; params stay fp32

    @nn.compact
    def __call__(self, x, output_size=None, fold_mode: str | None = None,
                 fold: FoldSpec | None = None,
                 fold_out: FoldSpec | None = None):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        ci = x.shape[-1] if fold is None else x.shape[-1] // fold.k
        kernel = self.param("kernel", torch_conv_init,
                            (kh, kw, self.features, ci))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        # output padding resolved against the requested output size
        def _opad(in_sz, k, s, p, target):
            base = (in_sz - 1) * s - 2 * p + k
            if target is None:
                return 0
            op = target - base
            if not 0 <= op < max(s, 2):
                raise ValueError(
                    f"requested output size {target} unreachable from "
                    f"{in_sz} (base {base}, stride {s})")
            return op

        if fold_mode is None:
            th = tw = None
            if output_size is not None:
                th, tw = output_size
            oph = _opad(x.shape[1], kh, sh, ph, th)
            opw = _opad(x.shape[2], kw, sw, pw, tw)
            # transpose conv == dilated-input correlation w/ flipped kernel
            flipped = kernel[::-1, ::-1]  # (kh, kw, out, in)
            rhs = jnp.transpose(flipped, (0, 1, 3, 2))  # HWIO
            xc, rhs, bias = promote_dtype(x, rhs, bias, dtype=self.dtype)
            out = jax.lax.conv_general_dilated(
                xc, rhs, window_strides=(1, 1),
                padding=[(kh - 1 - ph, kh - 1 - ph + oph),
                         (kw - 1 - pw, kw - 1 - pw + opw)],
                lhs_dilation=(sh, sw),
                dimension_numbers=_DN)
            return out + bias if bias is not None else out

        if fold_mode == "band3t":         # 3x3 stride-1 pad-1
            assert (kh, kw, sh, sw, ph, pw) == (3, 3, 1, 1, 1, 1)
            # conv-equivalent kernel, then the standard 3-tap fold
            rhs = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))
            rhs = _fold_kernel_3tap(rhs, fold.k)
            xc, rhs, bias = promote_dtype(x, rhs, bias, dtype=self.dtype)
            out = jax.lax.conv_general_dilated(
                xc, rhs, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                dimension_numbers=_DN)
            return out + jnp.tile(bias, fold.k) if bias is not None else out

        if fold_mode == "genT":
            # general folded freq transpose conv (pad 0): the freq
            # upsample becomes a fold-channel expansion (k_out = sw*k),
            # time is the usual lhs-dilated flipped-kernel correlation.
            # Raw output: time sh*T - sh + kh rows (left crop 0), freq
            # fold_out.blocks folded positions; output_size=(tt, _) crops
            # or zero-extends time to tt BEFORE the bias add, so torch
            # output_padding rows come out as exactly `bias` — freq
            # carry bins hold bias too and must be masked by the caller.
            assert (ph, pw) == (0, 0) and fold is not None \
                and fold_out is not None and fold_out.k == sw * fold.k
            rhs, pl = fold_convT_kernel(kernel, fold.k, sw)
            pr = fold_out.blocks - x.shape[2] + rhs.shape[1] - 1 - pl
            assert pr >= 0, (fold_out.blocks, x.shape, rhs.shape, pl)
            tt = output_size[0]
            xc, rhs, bias = promote_dtype(x, rhs, bias, dtype=self.dtype)
            out = jax.lax.conv_general_dilated(
                xc, rhs, window_strides=(1, 1),
                padding=[(kh - 1, kh - 1), (pl, pr)],
                lhs_dilation=(sh, 1), dimension_numbers=_DN)
            assert out.shape[1] >= tt or kh == 1, (out.shape, tt)
            out = out[:, :tt]
            if out.shape[1] < tt:
                out = jnp.pad(out, ((0, 0), (0, tt - out.shape[1]),
                                    (0, 0), (0, 0)))
            if bias is not None:
                out = out + jnp.tile(bias, fold_out.k)
            return out

        assert fold_mode == "us2"
        assert (kh, kw, sh, sw, ph, pw) == (2, 2, 2, 2, 0, 0)
        assert fold_out is not None and fold_out.k == 2 * fold.k
        th, tw = output_size
        oph = _opad(x.shape[1], kh, sh, ph, th)
        opw = tw - 2 * fold.F
        assert 0 <= opw < 2, (tw, fold.F)
        assert tw == fold_out.F, (tw, fold_out.F)
        rhs = _fold_kernel_us2(kernel, fold.k)
        xc, rhs, bias = promote_dtype(x, rhs, bias, dtype=self.dtype)
        out = jax.lax.conv_general_dilated(
            xc, rhs, window_strides=(1, 1),
            padding=[(1, 1 + oph), (0, 0)],
            lhs_dilation=(2, 1),
            dimension_numbers=_DN)
        # torch rows past 2*F_in (output_padding) read no input: append
        # zero blocks, then the bias — out[2*F_in] = bias exactly.
        if out.shape[2] < fold_out.blocks:
            out = jnp.pad(out, ((0, 0), (0, 0),
                                (0, fold_out.blocks - out.shape[2]),
                                (0, 0)))
        if bias is not None:
            out = out + jnp.tile(bias, fold_out.k)
        return out


class MaskedBatchNorm(nn.Module):
    """nn.BatchNorm-compatible (identical param/batch_stats tree) batch
    norm over a frequency-folded tensor: statistics are per *logical*
    channel, exclude the zeroed carry bins, and divide by the true bin
    count. Matches flax BatchNorm semantics otherwise (biased variance,
    fp32 promotion, `ra = m*ra + (1-m)*batch` running update)."""
    momentum: float = 1.0 - BATCHNORM_MOMENTUM
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xf, use_running_average: bool, fold: FoldSpec):
        k = fold.k
        C = xf.shape[-1] // k
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,)))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            B, T, bl, _ = xf.shape
            v = fold.mask_mul(xf).astype(
                jnp.promote_types(xf.dtype, jnp.float32))
            v = v.reshape(B, T, bl, k, C)
            n = B * T * fold.F
            mean = v.sum(axis=(0, 1, 2, 3)) / n
            var = (v * v).sum(axis=(0, 1, 2, 3)) / n - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        x32, scale, bias = promote_dtype(xf, scale, bias, dtype=None)
        mul = jnp.tile(scale * jax.lax.rsqrt(var + self.epsilon), k)
        add = jnp.tile(bias - mean * scale *
                       jax.lax.rsqrt(var + self.epsilon), k)
        return x32 * mul + add


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

class EncBlock(nn.Module):
    """Reference `block` (`model/self_attention_VAT.py:844-859`)."""
    out: int
    ksize: Sequence[int] = (3, 3)
    pad: Sequence[int] = (1, 1)
    ds_ksize: Sequence[int] = (2, 2)
    ds_stride: Sequence[int] = (2, 2)
    dtype: str | None = None

    def setup(self):
        kw = dict(padding=self.pad, dtype=self.dtype)
        self.conv1 = TorchConv(self.out, _pair(self.ksize), **kw)
        self.bn1 = MaskedBatchNorm()
        self.conv2 = TorchConv(self.out, _pair(self.ksize), **kw)
        self.bn2 = MaskedBatchNorm()
        self.skip = TorchConv(self.out, (1, 1), padding=(0, 0),
                              dtype=self.dtype)
        self.ds = TorchConv(self.out, _pair(self.ds_ksize),
                            strides=_pair(self.ds_stride), padding=(0, 0),
                            dtype=self.dtype)

    def __call__(self, x, train: bool, fs: FoldSpec | None = None,
                 fs_next: FoldSpec | None = None):
        if fs is None:
            one = FoldSpec(x.shape[2], 1)   # degenerate: plain NHWC
            x11 = nn.leaky_relu(self.bn1(self.conv1(x), not train, one))
            x12 = nn.leaky_relu(self.bn2(self.conv2(x11), not train, one))
            x12 = x12 + self.skip(x)
            xp = self.ds(x12)
            return xp, x12.shape[1:3]  # (time, freq) size pre-downsample

        y = self.conv1(x, fold_mode="band3", fold=fs)
        y = fs.mask_mul(nn.leaky_relu(self.bn1(y, not train, fs)))
        y = self.conv2(y, fold_mode="band3", fold=fs)
        y = nn.leaky_relu(self.bn2(y, not train, fs))
        x12 = fs.mask_mul(y + self.skip(x, fold_mode="diag", fold=fs))
        if fs.k == 1:
            xp = self.ds(x12)
        else:
            xp = self.ds(x12, fold_mode="ds2", fold=fs)
            if fs_next is not None:
                assert fs_next.k == fs.k // 2
                if xp.shape[2] > fs_next.blocks:
                    xp = xp[:, :, :fs_next.blocks]
                xp = fs_next.mask_mul(xp)
        return xp, (x12.shape[1], fs.F)


class DBlock(nn.Module):
    """Reference `d_block` (`model/self_attention_VAT.py:861-882`)."""
    inp: int
    out: int
    is_last: bool
    ksize: Sequence[int] = (3, 3)
    pad: Sequence[int] = (1, 1)
    ds_ksize: Sequence[int] = (2, 2)
    ds_stride: Sequence[int] = (2, 2)
    dtype: str | None = None

    def setup(self):
        mid = self.inp // 2
        self.conv2d = TorchConvTranspose(mid, self.ksize, (1, 1), self.pad,
                                         dtype=self.dtype)
        self.bn2d = MaskedBatchNorm()
        self.conv1d = TorchConvTranspose(self.out, self.ksize, (1, 1),
                                         self.pad, dtype=self.dtype)
        if not self.is_last:
            self.bn1d = MaskedBatchNorm()
            us_ch = self.inp - self.out
        else:
            us_ch = self.inp
        self.us = TorchConvTranspose(us_ch, self.ds_ksize, self.ds_stride,
                                     (0, 0), dtype=self.dtype)

    def __call__(self, x, size, skip, train: bool,
                 fs_in: FoldSpec | None = None,
                 fs_out: FoldSpec | None = None):
        if fs_out is None:
            one = None
            x = self.us(x, output_size=size)
            if not self.is_last:
                x = jnp.concatenate([x, skip], axis=-1)
            one = FoldSpec(x.shape[2], 1)
            x = nn.leaky_relu(self.bn2d(self.conv2d(x), not train, one))
            if self.is_last:
                return self.conv1d(x)
            return nn.leaky_relu(self.bn1d(self.conv1d(x), not train, one))

        if fs_in.k == 1 and fs_out.k == 1:
            x = self.us(x, output_size=size)
        else:
            x = self.us(x, output_size=size, fold_mode="us2",
                        fold=fs_in, fold_out=fs_out)
        x = fs_out.mask_mul(x)
        if not self.is_last:
            x = fold_concat(x, skip, fs_out)
        y = self.conv2d(x, fold_mode="band3t", fold=fs_out)
        y = fs_out.mask_mul(nn.leaky_relu(self.bn2d(y, not train, fs_out)))
        if self.is_last:
            return self.conv1d(y, fold_mode="band3t", fold=fs_out)
        y = self.conv1d(y, fold_mode="band3t", fold=fs_out)
        return fs_out.mask_mul(
            nn.leaky_relu(self.bn1d(y, not train, fs_out)))


class Encoder(nn.Module):
    """Reference `Encoder` (`model/self_attention_VAT.py:884-906`).

    layout='folded' computes in the frequency-folded layout (requires the
    standard (2,2)-stride config); the parameter tree is identical.
    """
    ds_ksize: Sequence[int] = (2, 2)
    ds_stride: Sequence[int] = (2, 2)
    dtype: str | None = None
    layout: str = "nhwc"

    def setup(self):
        if self.layout == "folded":
            assert (_pair(self.ds_ksize) == (2, 2)
                    and _pair(self.ds_stride) == (2, 2)), \
                "folded layout requires the (2,2)-strided U-Net"
        kw = dict(ds_ksize=self.ds_ksize, ds_stride=self.ds_stride,
                  dtype=self.dtype)
        self.block1 = EncBlock(16, **kw)
        self.block2 = EncBlock(32, **kw)
        self.block3 = EncBlock(64, **kw)
        self.block4 = EncBlock(128, **kw)
        ckw = dict(padding=(1, 1), dtype=self.dtype)
        self.conv1 = TorchConv(64, (3, 3), **ckw)
        self.conv2 = TorchConv(32, (3, 3), **ckw)
        self.conv3 = TorchConv(16, (3, 3), **ckw)

    def __call__(self, x, train: bool):
        if self.layout != "folded":
            x1, s1 = self.block1(x, train)
            x2, s2 = self.block2(x1, train)
            x3, s3 = self.block3(x2, train)
            x4, s4 = self.block4(x3, train)
            c1 = self.conv1(x3)
            c2 = self.conv2(x2)
            c3 = self.conv3(x1)
            return x4, [s1, s2, s3, s4], [c1, c2, c3, x1]

        f1, f2, f3, f4 = unet_fold_specs(x.shape[2])
        xf = f1.fold3(x[..., 0])       # (B, T, blocks, 8) — spec is 1-ch
        x1, s1 = self.block1(xf, train, f1, f2)
        x2, s2 = self.block2(x1, train, f2, f3)
        x3, s3 = self.block3(x2, train, f3, f4)
        x4, s4 = self.block4(x3, train, f4, None)
        c1 = self.conv1(x3)            # res4: k=1, plain conv
        c2 = f3.mask_mul(self.conv2(x2, fold_mode="band3", fold=f3))
        c3 = f2.mask_mul(self.conv3(x1, fold_mode="band3", fold=f2))
        return x4, [s1, s2, s3, s4], [c1, c2, c3, x1]


class Decoder(nn.Module):
    """Reference `Decoder`, decoder head width = `num_instruments`
    (`model/self_attention_VAT.py:908-926`, `model/UNet_onset.py:250-268`).

    In the folded layout the output stays folded — (B, T, blocks,
    k*num_instruments); use `unfold_channels` to read the per-channel
    (B, T, F) maps without materializing a padded NHWC intermediate.
    """
    num_instruments: int = 1
    ds_ksize: Sequence[int] = (2, 2)
    ds_stride: Sequence[int] = (2, 2)
    dtype: str | None = None
    layout: str = "nhwc"

    def setup(self):
        kw = dict(ds_ksize=self.ds_ksize, ds_stride=self.ds_stride,
                  dtype=self.dtype)
        self.d_block1 = DBlock(192, 64, False, **kw)
        self.d_block2 = DBlock(96, 32, False, **kw)
        self.d_block3 = DBlock(48, 16, False, **kw)
        self.d_block4 = DBlock(16, self.num_instruments, True, **kw)

    def __call__(self, x, s, c, train: bool):
        if self.layout != "folded":
            x = self.d_block1(x, s[3], c[0], train)
            x = self.d_block2(x, s[2], c[1], train)
            x = self.d_block3(x, s[1], c[2], train)
            x = self.d_block4(x, s[0], None, train)
            return x  # no activation (heads apply their own sigmoid)

        f1, f2, f3, f4 = unet_fold_specs(s[0][1])
        f5 = FoldSpec((f4.F - 2) // 2 + 1, 1)  # bottleneck level
        x = self.d_block1(x, s[3], c[0], train, f5, f4)
        x = self.d_block2(x, s[2], c[1], train, f4, f3)
        x = self.d_block3(x, s[1], c[2], train, f3, f2)
        x = self.d_block4(x, s[0], None, train, f2, f1)
        return x  # folded (B, T, blocks, k*num_instruments)
