"""Semantic segmentation transcriber ("baseline_Multi_Inst").

Port target: reference `Semantic_Segmentation` (`model/Segmentation.py:
136-642`) — a TF-style DeepLab-ish net: pre-activation residual Conv_Blocks
with hand-computed TF-SAME padding, two 17x17 local 2D-attention layers at
the 256-channel bottleneck, a transpose-conv decoder with Keras SAME output
trimming, and a final Linear(N_BINS -> 88) inference head.

TF-SAME padding and the transpose-conv trimming reproduce the reference
pixel-exactly (`model/Segmentation.py:76-133`).

Two computation layouts over the same parameter tree (same scheme as the
flagship U-Net, `nn/unet.py`):

- ``nhwc``: plain layout. On TPU the 32/64-channel full- and
  half-resolution levels tile-pad their channel minor dim to 128 lanes.
- ``folded``: frequency space-to-depth folded into channels so those
  levels present exactly 128 lanes: k=4 at full resolution (32 ch),
  k=4 at half resolution (32 ch, re-folded after the stride-2
  downsampler since the channel width does not double), k=2 at quarter
  resolution (64 ch); the 128/256-channel deep levels and the 2D
  attention bottleneck run unfolded. TF-SAME freq padding is absorbed
  into the kernel scatters (`fold_conv_kernel` left-pad argument);
  TF-SAME right-crops of transpose convs land in masked carry bins.
  Documented divergence: dropout masks are drawn on the folded shapes,
  so a folded training run consumes a different (identically
  distributed) dropout stream than an NHWC run with the same seed.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..nn.unet import (FoldSpec, MaskedBatchNorm, TorchConv,
                       TorchConvTranspose, fold_concat, refold,
                       torch_conv_init, unfold_channels)
from ..ops.normalize import Normalization
from ..ops.spectrogram import frontend_precision, make_frontend
from ..vat import VATConfig, vat_loss
from .losses import binary_cross_entropy

N_KEYS = C.N_KEYS


def resolve_seg_layout(layout: str) -> str:
    """Resolve the 'auto' Segmentation computation layout.

    'auto' -> 'folded' on TPU, 'nhwc' elsewhere — measured decision
    (`bench_logs/r4_seg_ab.log`, v5e chip, B=8+8 x 640 VAT train step,
    bf16): folded 336.2 ms/step vs nhwc 471.1 ms/step = 1.40x. The win
    is smaller than the flagship U-Net's 3.21x because Segmentation's
    32-channel-everywhere widths pad less and its 17x17 2D attention is
    layout-independent. `RECONVAT_SEG_LAYOUT` overrides.
    """
    import os

    env = os.environ.get("RECONVAT_SEG_LAYOUT")
    resolved = layout if layout != "auto" else (
        env or ("folded" if jax.default_backend() == "tpu" else "nhwc"))
    if resolved not in ("folded", "nhwc"):
        raise ValueError(
            f"unknown Segmentation layout {resolved!r} (from "
            f"{'RECONVAT_SEG_LAYOUT' if layout == 'auto' and env else 'conv_layout'}): "
            "expected 'auto', 'folded' or 'nhwc'")
    return resolved


def _pad_amount(size, k, s):
    if size % s == 0:
        return max(k - s, 0)
    return max(k - (size % s), 0)


def tf_same_pad(x, ksize, stride):
    """TF 'SAME' asymmetric padding on NHWC (reference `calculate_padding` +
    `SAME_padding`, `model/Segmentation.py:76-133`)."""
    kh, kw = ksize
    sh, sw = stride
    ph = _pad_amount(x.shape[1], kh, sh)
    pw = _pad_amount(x.shape[2], kw, sw)
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                       (pw // 2, pw - pw // 2), (0, 0)))


def transpose_padding_same(x, input_hw, stride):
    """Crop ConvTranspose output back to input*stride
    (reference `transpose_padding_same`, `model/Segmentation.py:112-129`)."""
    th, tw = input_hw[0] * stride[0], input_hw[1] * stride[1]
    rh, rw = x.shape[1] - th, x.shape[2] - tw
    if rh > 0:
        x = x[:, rh // 2: x.shape[1] - (rh // 2 + rh % 2)]
    if rw > 0:
        x = x[:, :, rw // 2: x.shape[2] - (rw // 2 + rw % 2)]
    return x


def _time_same_pad(x, kh, sh):
    """TF-SAME padding on the time axis only (freq pads are folded into
    the kernel scatters on the folded path)."""
    ph = _pad_amount(x.shape[1], kh, sh)
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (0, 0), (0, 0)))


class ConvBlockSeg(nn.Module):
    """Reference `Conv_Block` (`model/Segmentation.py:136-182`)."""
    inp: int
    out: int
    ksize: tuple = (3, 3)
    stride: tuple = (2, 2)
    dropout_rate: float = 0.4
    dtype: str | None = None   # computation dtype; params/BN stay fp32

    def setup(self):
        # TorchConv == nn.Conv parameter tree (kernel HWIO + bias);
        # swapped for its folded application modes
        self.conv1 = TorchConv(self.out, self.ksize, strides=self.stride,
                               padding=(0, 0), dtype=self.dtype)
        self.bn1 = MaskedBatchNorm(momentum=0.9)
        self.dropout1 = nn.Dropout(self.dropout_rate)
        self.conv2 = TorchConv(self.out, self.ksize, strides=(1, 1),
                               padding=(0, 0), dtype=self.dtype)
        self.bn2 = MaskedBatchNorm(momentum=0.9)
        self.dropout2 = nn.Dropout(self.dropout_rate)
        self.conv_skip = TorchConv(self.out, (1, 1), strides=self.stride,
                                   padding=(0, 0), dtype=self.dtype)

    def __call__(self, x, train: bool, fs_in: FoldSpec | None = None,
                 fs_mid: FoldSpec | None = None,
                 fs_out: FoldSpec | None = None):
        if fs_in is None:
            skip = x
            one = FoldSpec(x.shape[2], 1)
            x = self.bn1(nn.relu(x), not train, one)
            x = self.dropout1(x, deterministic=not train)
            x = tf_same_pad(x, self.ksize, self.stride)
            x = self.conv1(x)
            one2 = FoldSpec(x.shape[2], 1)
            x = self.bn2(nn.relu(x), not train, one2)
            x = self.dropout2(x, deterministic=not train)
            x = tf_same_pad(x, self.ksize, (1, 1))
            x = self.conv2(x)
            if self.stride != (1, 1):
                skip = tf_same_pad(skip, (1, 1), self.stride)
                skip = self.conv_skip(skip)
            return x + skip

        # folded: fs_mid = conv1's output fold (fs_in.k // freq stride);
        # fs_out may re-fold block pairs back up (pure reshape)
        kh, kw = self.ksize
        sh, sw = self.stride
        skip = x
        x = fs_in.mask_mul(self.bn1(nn.relu(x), not train, fs_in))
        x = self.dropout1(x, deterministic=not train)
        pl1 = _pad_amount(fs_in.F, kw, sw) // 2
        x = self.conv1(_time_same_pad(x, kh, sh), fold_mode="gen",
                       fold=fs_in, fold_out=fs_mid, f_pad=pl1)
        if fs_mid.k != fs_out.k:
            x = refold(x, fs_mid, fs_out)
        x = fs_out.mask_mul(self.bn2(nn.relu(x), not train, fs_out))
        x = self.dropout2(x, deterministic=not train)
        x = self.conv2(_time_same_pad(x, kh, 1), fold_mode="gen",
                       fold=fs_out, fold_out=fs_out,
                       f_pad=_pad_amount(fs_out.F, kw, 1) // 2)
        if self.stride != (1, 1):
            skip = self.conv_skip(_time_same_pad(skip, 1, sh),
                                  fold_mode="gen", fold=fs_in,
                                  fold_out=fs_mid, f_pad=0)
            if fs_mid.k != fs_out.k:
                skip = refold(skip, fs_mid, fs_out)
        return fs_out.mask_mul(x + skip)


class TransposeConvBlock(nn.Module):
    """Reference `transpose_conv_block` (`model/Segmentation.py:185-237`)."""
    inp: int
    out: int
    ksize: tuple = (3, 3)
    stride: tuple = (2, 2)
    dropout_rate: float = 0.4
    dtype: str | None = None

    def setup(self):
        self.conv1 = TorchConv(self.out, self.ksize, strides=(1, 1),
                               padding=(0, 0), dtype=self.dtype)
        self.bn1 = MaskedBatchNorm(momentum=0.9)
        self.dropout1 = nn.Dropout(self.dropout_rate)
        self.conv2 = TorchConvTranspose(self.out, self.ksize, self.stride,
                                        (0, 0), dtype=self.dtype)
        self.bn2 = MaskedBatchNorm(momentum=0.9)
        self.dropout2 = nn.Dropout(self.dropout_rate)
        self.conv_skip = TorchConvTranspose(self.out, (1, 1), self.stride,
                                            (0, 0), dtype=self.dtype)

    def __call__(self, x, target_hw, train: bool,
                 fs_in: FoldSpec | None = None,
                 fs_out: FoldSpec | None = None):
        if fs_in is None:
            skip = x
            one = FoldSpec(x.shape[2], 1)
            x = self.bn1(nn.relu(x), not train, one)
            x = self.dropout1(x, deterministic=not train)
            x = tf_same_pad(x, self.ksize, (1, 1))
            x = self.conv1(x)
            one2 = FoldSpec(x.shape[2], 1)
            x = self.bn2(nn.relu(x), not train, one2)
            x = self.dropout2(x, deterministic=not train)
            input_hw = x.shape[1:3]
            x = self.conv2(x)
            x = transpose_padding_same(x, input_hw, self.stride)
            # extra-pixel trim to encoder shape (`Segmentation.py:223-226`)
            if x.shape[1] > target_hw[0]:
                x = x[:, :-1]
            if x.shape[2] > target_hw[1]:
                x = x[:, :, :-1]
            if self.stride != (1, 1):
                skip = self.conv_skip(skip, output_size=x.shape[1:3])
            return x + skip

        # folded: fs_out covers target_hw[1] = the already-trimmed freq
        # size (TF-SAME right-crops fall into masked carry bins)
        kh, kw = self.ksize
        assert fs_out.F == target_hw[1] and fs_out.k == self.stride[1] \
            * fs_in.k
        skip = x
        x = fs_in.mask_mul(self.bn1(nn.relu(x), not train, fs_in))
        x = self.dropout1(x, deterministic=not train)
        x = self.conv1(_time_same_pad(x, kh, 1), fold_mode="gen",
                       fold=fs_in, fold_out=fs_in,
                       f_pad=_pad_amount(fs_in.F, kw, 1) // 2)
        x = fs_in.mask_mul(self.bn2(nn.relu(x), not train, fs_in))
        x = self.dropout2(x, deterministic=not train)
        # raw transpose time = stride*T + (kh - stride); crop to
        # stride*T (transpose_padding_same, top crop always 0), then
        # the extra-pixel trim to the encoder time
        tt = min(x.shape[1] * self.stride[0], target_hw[0])
        x = self.conv2(x, output_size=(tt, None), fold_mode="genT",
                       fold=fs_in, fold_out=fs_out)
        skip = self.conv_skip(skip, output_size=(tt, None),
                              fold_mode="genT", fold=fs_in,
                              fold_out=fs_out)
        return fs_out.mask_mul(x + skip)


class MultiHeadAttention2D(nn.Module):
    """Reference `MutliHeadAttention2D` (`model/Segmentation.py:277-354`):
    2D local attention with separate time/freq relative embeddings split
    across channel halves. Window materialization is fine here — it only
    runs on the (T/16, F/16) bottleneck."""
    out_channels: int
    kernel_size: tuple = (3, 3)
    groups: int = 1
    use_bias: bool = False
    dtype: str | None = None

    def setup(self):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        self.query_conv = nn.Conv(self.out_channels, (1, 1),
                                  use_bias=self.use_bias,
                                  kernel_init=kaiming, dtype=self.dtype)
        self.key_conv = nn.Conv(self.out_channels, (1, 1),
                                use_bias=self.use_bias, kernel_init=kaiming,
                                dtype=self.dtype)
        self.value_conv = nn.Conv(self.out_channels, (1, 1),
                                  use_bias=self.use_bias,
                                  kernel_init=kaiming, dtype=self.dtype)
        kh, kw = self.kernel_size
        # torch shapes kept verbatim for weight conversion
        self.rel_t = self.param("rel_t", nn.initializers.normal(1.0),
                                (self.out_channels // 2, 1, 1, kh, 1))
        self.rel_f = self.param("rel_f", nn.initializers.normal(1.0),
                                (self.out_channels // 2, 1, 1, 1, kw))

    def __call__(self, x):
        B, H, W, _ = x.shape
        kh, kw = self.kernel_size
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        Co = self.out_channels
        G = self.groups

        q = self.query_conv(x)
        xpad = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        k = self.key_conv(xpad)
        v = self.value_conv(xpad)

        def windows(t):
            rows = []
            for u in range(kh):
                cols = [t[:, u:u + H, vv:vv + W, :] for vv in range(kw)]
                rows.append(jnp.stack(cols, axis=-1))   # (B,H,W,C,kw)
            return jnp.stack(rows, axis=-2)             # (B,H,W,C,kh,kw)

        k_win = windows(k)
        v_win = windows(v)

        rel_t = jnp.broadcast_to(self.rel_t[:, 0, 0, :, :],
                                 (Co // 2, kh, kw))
        rel_f = jnp.broadcast_to(self.rel_f[:, 0, 0, :, :],
                                 (Co // 2, kh, kw))
        rel = jnp.concatenate([rel_t, rel_f], axis=0)   # (C, kh, kw)
        k_win = k_win + rel[None, None, None].astype(k_win.dtype)

        qg = q.reshape(B, H, W, G, Co // G)
        kg = k_win.reshape(B, H, W, G, Co // G, kh * kw)
        vg = v_win.reshape(B, H, W, G, Co // G, kh * kw)
        energy = jnp.einsum("bhwgc,bhwgck->bhwgk", qg, kg)
        # softmax in fp32 regardless of compute dtype
        attn = jax.nn.softmax(energy.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhwgk,bhwgck->bhwgc", attn.astype(vg.dtype), vg)
        return out.reshape(B, H, W, Co).astype(jnp.float32), attn


def seg_fold_specs(F: int):
    """FoldSpecs for the folded Segmentation levels.

    (f0, f1m, f1, f2, f3): full resolution k=4 (32 ch -> 128 lanes),
    half resolution k=2 pre-refold / k=4 post-refold (32 ch), quarter
    resolution k=2 (64 ch -> 128 lanes), eighth resolution k=1 (128 ch,
    unfolded from here down). TF-SAME stride-2 output size is ceil(F/2).
    """
    F1 = -(-F // 2)
    F2 = -(-F1 // 2)
    F3 = -(-F2 // 2)
    return (FoldSpec(F, 4), FoldSpec(F1, 2), FoldSpec(F1, 4),
            FoldSpec(F2, 2), FoldSpec(F3, 1))


class SegEncoder(nn.Module):
    """Reference Segmentation `Encoder` (`model/Segmentation.py:356-431`)."""
    dropout_rate: float = 0.4
    dtype: str | None = None

    def setup(self):
        d, dt = self.dropout_rate, self.dtype
        self.encoding_layer = TorchConv(32, (7, 7), strides=(1, 1),
                                        padding=(0, 0), dtype=dt)
        self.layer1a = ConvBlockSeg(32, 32, (3, 3), (2, 2), d, dt)
        self.layer1b = ConvBlockSeg(32, 32, (3, 3), (1, 1), d, dt)
        self.layer2a = ConvBlockSeg(32, 64, (3, 3), (2, 2), d, dt)
        self.layer2b = ConvBlockSeg(64, 64, (3, 3), (1, 1), d, dt)
        self.layer2c = ConvBlockSeg(64, 64, (3, 3), (1, 1), d, dt)
        self.layer3a = ConvBlockSeg(64, 128, (3, 3), (2, 2), d, dt)
        self.layer3b = ConvBlockSeg(128, 128, (3, 3), (1, 1), d, dt)
        self.layer3c = ConvBlockSeg(128, 128, (3, 3), (1, 1), d, dt)
        self.layer3d = ConvBlockSeg(128, 128, (3, 3), (1, 1), d, dt)
        self.layer4a = ConvBlockSeg(128, 256, (3, 3), (2, 2), d, dt)
        self.layer4b = ConvBlockSeg(256, 256, (3, 3), (1, 1), d, dt)
        self.layer4c = ConvBlockSeg(256, 256, (3, 3), (1, 1), d, dt)
        self.layer4d = ConvBlockSeg(256, 256, (3, 3), (1, 1), d, dt)
        self.layer4e = ConvBlockSeg(256, 256, (3, 3), (1, 1), d, dt)

    def __call__(self, x, train: bool, folded: bool = False):
        if not folded:
            original_hw = x.shape[1:3]
            x = tf_same_pad(x, (7, 7), (1, 1))
            x = self.encoding_layer(x)
            x = self.layer1a(x, train)
            x = self.layer1b(x, train)
            en_l1, hw1 = x, x.shape[1:3]
            x = self.layer2a(x, train)
            x = self.layer2b(x, train)
            x = self.layer2c(x, train)
            en_l2, hw2 = x, x.shape[1:3]
        else:
            f0, f1m, f1, f2, f3 = seg_fold_specs(x.shape[2])
            original_hw = x.shape[1:3]
            xf = f0.fold3(x[..., 0])         # spec input is 1-channel
            xf = _time_same_pad(xf, 7, 1)
            x = self.encoding_layer(xf, fold_mode="gen", fold=f0,
                                    fold_out=f0,
                                    f_pad=_pad_amount(f0.F, 7, 1) // 2)
            x = f0.mask_mul(x)
            x = self.layer1a(x, train, f0, f1m, f1)
            x = self.layer1b(x, train, f1, f1, f1)
            en_l1, hw1 = x, (x.shape[1], f1.F)
            x = self.layer2a(x, train, f1, f2, f2)
            x = self.layer2b(x, train, f2, f2, f2)
            x = self.layer2c(x, train, f2, f2, f2)
            en_l2, hw2 = x, (x.shape[1], f2.F)
            # layer3a unfolds: k_out = 1, blocks == bins -> plain NHWC
            x = self.layer3a(x, train, f2, f3, f3)
        if folded:
            x = self.layer3b(x, train)
        else:
            x = self.layer3a(x, train)
            x = self.layer3b(x, train)
        x = self.layer3c(x, train)
        x = self.layer3d(x, train)
        en_l3, hw3 = x, x.shape[1:3]
        x = self.layer4a(x, train)
        x = self.layer4b(x, train)
        x = self.layer4c(x, train)
        x = self.layer4d(x, train)
        x = self.layer4e(x, train)
        return x, (en_l1, en_l2, en_l3), (original_hw, hw1, hw2, hw3)


class DecoderBlockSeg(nn.Module):
    """Reference `Decoder_Block` (`model/Segmentation.py:239-275`)."""
    input_channels: int
    encoder_channels: int
    hidden_channels: int
    output_channels: int
    dropout_rate: float = 0.4
    dtype: str | None = None

    def setup(self):
        self.layer1a = TorchConv(self.hidden_channels, (1, 1),
                                 strides=(1, 1), padding=(0, 0),
                                 dtype=self.dtype)
        self.bn = MaskedBatchNorm(momentum=0.9)
        self.bn_en = MaskedBatchNorm(momentum=0.9)
        self.dropout1 = nn.Dropout(self.dropout_rate)
        self.layer1b = TransposeConvBlock(self.input_channels,
                                          self.output_channels, (3, 3),
                                          (2, 2), self.dropout_rate,
                                          self.dtype)

    def __call__(self, x, encoder_output, encoder_hw, train: bool,
                 fs: FoldSpec | None = None,
                 fs_out: FoldSpec | None = None):
        if fs is None:
            skip = x
            one = FoldSpec(x.shape[2], 1)
            x = self.bn(nn.relu(x), not train, one)
            en_l = self.bn_en(nn.relu(encoder_output), not train, one)
            x = jnp.concatenate([x, en_l], axis=-1)
            x = self.dropout1(x, deterministic=not train)
            x = self.layer1a(x)
            x = x + skip
            return self.layer1b(x, encoder_hw, train)

        skip = x
        x = self.bn(nn.relu(x), not train, fs)
        en_l = self.bn_en(nn.relu(encoder_output), not train, fs)
        x = fold_concat(x, en_l, fs)
        x = self.dropout1(x, deterministic=not train)
        x = self.layer1a(x, fold_mode="diag", fold=fs)
        x = fs.mask_mul(x + skip)
        return self.layer1b(x, encoder_hw, train, fs, fs_out)


class SegDecoder(nn.Module):
    dropout_rate: float = 0.4
    dtype: str | None = None

    def setup(self):
        d, dt = self.dropout_rate, self.dtype
        self.de_layer1 = DecoderBlockSeg(128, 128, 128, 64, d, dt)
        self.de_layer2 = DecoderBlockSeg(64, 64, 64, 64, d, dt)
        self.de_layer3 = DecoderBlockSeg(64, 32, 64, 64, d, dt)

    def __call__(self, x, encoder_outputs, encoder_hws, train: bool,
                 folded: bool = False):
        if not folded:
            x = self.de_layer1(x, encoder_outputs[-1], encoder_hws[-2],
                               train)
            x = self.de_layer2(x, encoder_outputs[-2], encoder_hws[-3],
                               train)
            x = self.de_layer3(x, encoder_outputs[-3], encoder_hws[-4],
                               train)
            return x
        # folded: en_l3 is unfolded (k=1), en_l2 at k=2, en_l1 at k=4;
        # each up-block doubles the fold (k_out = 2*k_in)
        f0, _, f1, f2, f3 = seg_fold_specs(encoder_hws[0][1])
        x = self.de_layer1(x, encoder_outputs[-1], encoder_hws[-2], train,
                           f3, f2)
        x = self.de_layer2(x, encoder_outputs[-2], encoder_hws[-3], train,
                           f2, f1)
        ffin = FoldSpec(encoder_hws[0][1], 2 * f1.k)
        x = self.de_layer3(x, encoder_outputs[-3], encoder_hws[-4], train,
                           f1, ffin)
        return x  # folded (B, T, ffin.blocks, ffin.k * out_channels)


class SegmentationModule(nn.Module):
    """Reference `Semantic_Segmentation` forward
    (`model/Segmentation.py:504-537`)."""
    n_bins: int = C.N_BINS
    out_class: int = 2
    dropout_rate: float = 0.4
    dtype: str | None = None   # compute dtype; heads/BN/params stay fp32
    conv_layout: str = "nhwc"  # 'folded' = frequency-folded TPU layout

    def setup(self):
        d, dt = self.dropout_rate, self.dtype
        self.encoder = SegEncoder(d, dt)
        self.attention_layer1 = MultiHeadAttention2D(64, (17, 17), groups=1,
                                                     dtype=dt)
        self.bn1 = MaskedBatchNorm(momentum=0.9)
        self.attention_layer2 = MultiHeadAttention2D(128, (17, 17),
                                                     groups=1, dtype=dt)
        self.bn2 = MaskedBatchNorm(momentum=0.9)
        self.layer0a = TorchConv(256, (1, 1), strides=(1, 1),
                                 padding=(0, 0), dtype=dt)
        self.layer0b = TransposeConvBlock(256, 128, (3, 3), (2, 2), d, dt)
        self.decoder = SegDecoder(d, dt)
        self.bn_last = MaskedBatchNorm(momentum=0.9)
        self.dropout_last = nn.Dropout(d)
        self.conv_last = TorchConv(self.out_class, (1, 1), strides=(1, 1),
                                   padding=(0, 0))
        self.inference_model = nn.Dense(N_KEYS, kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        """x (B, T, F, 1) -> posteriogram.

        out_class == 1: (B, T, 88); out_class > 1: (B, out_class, T, 88)
        — the reference's `x.squeeze(1)` (`model/Segmentation.py:531`) is a
        no-op when conv_last has >1 channel, so the Linear maps the NCHW
        tensor per-channel and the channel axis survives."""
        folded = self.conv_layout == "folded"
        F = x.shape[2]
        x, encoder_outputs, encoder_hws = self.encoder(x, train, folded)
        en_l4 = x
        one4 = FoldSpec(x.shape[2], 1)
        x, _ = self.attention_layer1(en_l4)
        x = self.bn1(nn.relu(x), not train, one4)
        x, _ = self.attention_layer2(x)
        x = self.bn2(nn.relu(x), not train, one4)
        x = jnp.concatenate([en_l4, x], axis=-1)
        x = self.layer0a(x)
        x = x + en_l4
        x = self.layer0b(x, encoder_hws[-1], train)
        x = self.decoder(x, encoder_outputs, encoder_hws, train, folded)
        if not folded:
            one0 = FoldSpec(x.shape[2], 1)
            x = self.bn_last(nn.relu(x), not train, one0)
            x = self.dropout_last(x, deterministic=not train)
            x = self.conv_last(x)                # (B, T, F, out_class)
            chans = [x[..., i] for i in range(self.out_class)]
        else:
            ffin = FoldSpec(F, 8)
            x = ffin.mask_mul(self.bn_last(nn.relu(x), not train, ffin))
            x = self.dropout_last(x, deterministic=not train)
            x = self.conv_last(x, fold_mode="diag", fold=ffin)
            chans = unfold_channels(x, ffin, self.out_class)
        if self.out_class == 1:
            return nn.sigmoid(self.inference_model(chans[0]))
        # multi-instrument head: keep channels, linear over bins
        x = jnp.stack(chans, axis=1)             # (B, out_class, T, F)
        return nn.sigmoid(self.inference_model(x))


@dataclasses.dataclass
class SemanticSegmentation:
    """Batch contract (`model/Segmentation.py:539-631`)."""
    out_class: int = 1
    dropout_rate: float = 0.4
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    xi: float = 1e-6
    eps: float = 1e-2
    kl_div: bool = False
    n_heads: int = 1
    reconstruction: bool = False
    compute_dtype: str | None = None  # 'bfloat16' = mixed-precision compute
    conv_layout: str = "auto"  # 'auto' -> nhwc pending a chip measurement
                               # (see resolve_seg_layout)

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = SegmentationModule(
            self.n_bins, self.out_class, self.dropout_rate,
            dtype=self.compute_dtype,
            conv_layout=resolve_seg_layout(self.conv_layout))
        self.normalize = Normalization(self.mode)
        self.vat_cfg = VATConfig(xi=self.xi, eps=self.eps, n_power=1,
                                 kl_div=self.kl_div, norm_axis=2)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins, 1))
        return self.module.init({"params": key}, dummy, train=False)

    def make_spec(self, audio, t_true=None):
        from ..parallel.mesh import spec_constraint

        from .common import make_log_norm_spec

        spec = make_log_norm_spec(self, audio, t_true)
        return spec_constraint(spec[..., None])

    def _model_fn(self, variables, train, rngs=None):
        def fn(x):
            if train:
                out, _ = self.module.apply(variables, x, train=True,
                                           mutable=["batch_stats"],
                                           rngs=rngs)
                return out
            return self.module.apply(variables, x, train=False)
        return fn

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, t_true=None):
        from .common import frame_mask

        prefix = "train" if train else "test"
        frame_label = batch_l["frame"]
        mask = (None if t_true is None
                else frame_mask(t_true, frame_label.shape[1]))
        zero = jnp.zeros(())

        key = key if key is not None else jax.random.PRNGKey(0)
        key, drop_key = jax.random.split(key)
        rngs = {"dropout": drop_key} if train else None

        lds_ul, r_norm_ul = zero, zero
        if batch_ul is not None:
            spec_ul = self.make_spec(batch_ul["audio"])
            k_ul, key = jax.random.split(key)
            lds_ul, _, rn = vat_loss(self._model_fn(variables, train, rngs),
                                     spec_ul, k_ul, self.vat_cfg)
            r_norm_ul = jnp.mean(jnp.abs(rn))

        spec = self.make_spec(batch_l["audio"], t_true)

        lds_l, r_adv, r_norm_l = zero, None, zero
        if vat:
            k_l, key = jax.random.split(key)
            lds_l, r_adv, rn = vat_loss(self._model_fn(variables, train,
                                                       rngs),
                                        spec, k_l, self.vat_cfg)
            r_adv = r_adv[..., 0]
            r_norm_l = jnp.mean(jnp.abs(rn))

        if train:
            frame_pred, updates = self.module.apply(
                variables, spec, train=True, mutable=["batch_stats"],
                rngs=rngs)
            new_stats = updates.get("batch_stats")
        else:
            frame_pred = self.module.apply(variables, spec, train=False)
            new_stats = None

        predictions = {"onset": frame_pred, "frame": frame_pred,
                       "r_adv": r_adv}
        losses = {
            f"loss/{prefix}_frame":
                binary_cross_entropy(frame_pred, frame_label, mask),
            f"loss/{prefix}_LDS_l": lds_l,
        }
        if train:
            losses[f"loss/{prefix}_LDS_ul"] = lds_ul
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
            losses[f"loss/{prefix}_r_norm_ul"] = r_norm_ul
        else:
            losses[f"loss/{prefix}_r_norm_l"] = r_norm_l
        return predictions, losses, spec[..., 0], new_stats

    def transcribe(self, variables, audio, bucket_frames: int = 0):
        from .common import transcribe_spec

        spec, t_true = transcribe_spec(self, audio, bucket_frames)
        pianoroll = self.module.apply(variables, spec[..., None],
                                      train=False)
        if bucket_frames:
            # multi-instrument rolls are (B, out_class, T, 88): time sits
            # behind the channel axis (`SegmentationModule.__call__`)
            pianoroll = (pianoroll[:, :, :t_true] if self.out_class > 1
                         else pianoroll[:, :t_true])
        return {"onset": pianoroll, "frame": pianoroll}

    def transcribe_streaming(self, variables, audio, window_frames=640,
                             halo_frames=256, windows_per_batch=1,
                             mesh_ctx=None, pipeline_depth=3):
        """Bounded-memory transcription (haloed fixed-shape windows) —
        see `models/common.transcribe_streaming`.

        Unlike the flagship (banded window-31 attention, receptive field
        well inside halo 128), this model's receptive field exceeds any
        practical fixed halo: the 17x17 attention pair at the
        /16-resolution bottleneck alone sees +-256 full-resolution frames,
        and the ~30-conv encoder/decoder adds hundreds more. Streaming
        output is therefore an *approximation* near window seams — the
        default halo 256 covers the attention context, and the observed
        posterior deviation vs the one-shot path is ~3e-5 at
        random init (tests/test_streaming_transcribe.py); raise
        `halo_frames` for tighter agreement at proportional compute cost.
        The one-shot `transcribe` path is exact and preferred below
        ~10 min of audio."""
        import jax.numpy as jnp

        from .common import transcribe_streaming

        multi = self.out_class > 1

        def forward(variables, spec_image):
            roll = self.module.apply(variables, spec_image, train=False)
            if multi:
                # harness stitches along axis 1: present (B, T, C, 88)
                roll = jnp.moveaxis(roll, 1, 2)
            return {"onset": roll, "frame": roll}

        rolls = transcribe_streaming(self, forward, variables, audio,
                                     window_frames, halo_frames,
                                     windows_per_batch, mesh_ctx,
                                     pipeline_depth)
        if multi:  # back to the reference's (B, out_class, T, 88)
            import jax

            rolls = jax.tree_util.tree_map(
                lambda r: jnp.moveaxis(r, 2, 1), rolls)
        return rolls

    def load_reference_weights(self, path: str, variables):
        from ..train.torch_convert import load_torch_checkpoint, torch_to_flax

        sd = load_torch_checkpoint(path)
        converted, report = torch_to_flax(sd, variables)
        # stride-(1,1) Conv_Blocks define conv_skip but never use it
        # (`model/Segmentation.py:175-179`), so flax holds no params for it.
        residual = [k for k in report["skipped"]
                    if not k.startswith(("spectrogram.", "normalize.",
                                         "vat_loss."))
                    and ".conv_skip." not in k
                    and ".rel_t" not in k and ".rel_f" not in k]
        if residual:
            raise ValueError(f"unconverted model weights: {residual}")
        # rel_t / rel_f pass through verbatim (same shapes)
        params = converted["params"]
        for name, w in sd.items():
            if name.endswith((".rel_t", ".rel_f")):
                path_parts = name.split(".")
                node = params
                for p in path_parts[:-1]:
                    node = node[p]
                node[path_parts[-1]] = np.asarray(w, dtype=np.float32)
        return converted
