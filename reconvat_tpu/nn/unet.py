"""U-Net encoder/decoder blocks (flax, NHWC).

Structure mirrors the reference U-Net (`model/self_attention_VAT.py:844-926`):
residual double-conv encoder blocks with 1x1 skip and strided downsampling,
transpose-conv decoder blocks whose upsampler is driven to an explicit
target size (PyTorch `output_size=` semantics). Submodule names match the
reference state_dict names so released torch weights convert mechanically.

Activations are NHWC (batch, time, freq, channels) — the TPU conv layout —
vs the reference's NCHW.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BATCHNORM_MOMENTUM = 0.1  # torch convention; flax momentum = 1 - this

# torch default Conv2d/Linear init: kaiming_uniform(a=sqrt(5)) ==
# Uniform(+-sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                   "uniform")


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch semantics incl. `output_size` resolution.

    Kernel stored as (kh, kw, out_ch, in_ch) — the HWOI view of torch's
    (in, out, kh, kw) — so weight conversion is a pure transpose.
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    use_bias: bool = True
    dtype: str | None = None   # computation dtype; params stay fp32

    @nn.compact
    def __call__(self, x, output_size=None):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", torch_conv_init,
                            (kh, kw, self.features, in_ch))
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

        th = tw = None
        if output_size is not None:
            th, tw = output_size
        oph = _opad(x.shape[1], kh, sh, ph, th)
        opw = _opad(x.shape[2], kw, sw, pw, tw)

        # transpose conv == dilated-input correlation with flipped kernel
        flipped = kernel[::-1, ::-1]  # (kh, kw, out, in)
        rhs = jnp.transpose(flipped, (0, 1, 3, 2))  # HWIO
        if self.dtype is not None:
            x = x.astype(self.dtype)
            rhs = rhs.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            x, rhs, window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph + oph),
                     (kw - 1 - pw, kw - 1 - pw + opw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


def _bn(name=None):
    return nn.BatchNorm(momentum=1.0 - BATCHNORM_MOMENTUM, epsilon=1e-5,
                        name=name)


class EncBlock(nn.Module):
    """Reference `block` (`model/self_attention_VAT.py:844-859`)."""
    out: int
    ksize: Sequence[int] = (3, 3)
    pad: Sequence[int] = (1, 1)
    ds_ksize: Sequence[int] = (2, 2)
    ds_stride: Sequence[int] = (2, 2)
    dtype: str | None = None

    def setup(self):
        p = [_pair(self.pad)] * 2
        self.conv1 = nn.Conv(self.out, _pair(self.ksize), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn1 = _bn()
        self.conv2 = nn.Conv(self.out, _pair(self.ksize), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn2 = _bn()
        self.skip = nn.Conv(self.out, (1, 1), padding="VALID",
                            kernel_init=torch_conv_init, dtype=self.dtype)
        self.ds = nn.Conv(self.out, _pair(self.ds_ksize),
                          strides=_pair(self.ds_stride), padding="VALID",
                          kernel_init=torch_conv_init, dtype=self.dtype)

    def __call__(self, x, train: bool):
        x11 = nn.leaky_relu(self.bn1(self.conv1(x),
                                     use_running_average=not train))
        x12 = nn.leaky_relu(self.bn2(self.conv2(x11),
                                     use_running_average=not train))
        x12 = x12 + self.skip(x)
        xp = self.ds(x12)
        return xp, x12.shape[1:3]  # (time, freq) size pre-downsample


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
        self.bn2d = _bn()
        self.conv1d = TorchConvTranspose(self.out, self.ksize, (1, 1),
                                         self.pad, dtype=self.dtype)
        if not self.is_last:
            self.bn1d = _bn()
            us_ch = self.inp - self.out
        else:
            us_ch = self.inp
        self.us = TorchConvTranspose(us_ch, self.ds_ksize, self.ds_stride,
                                     (0, 0), dtype=self.dtype)

    def __call__(self, x, size, skip, train: bool):
        x = self.us(x, output_size=size)
        if not self.is_last:
            x = jnp.concatenate([x, skip], axis=-1)
        x = nn.leaky_relu(self.bn2d(self.conv2d(x),
                                    use_running_average=not train))
        if self.is_last:
            x = self.conv1d(x)
        else:
            x = nn.leaky_relu(self.bn1d(self.conv1d(x),
                                        use_running_average=not train))
        return x


class Encoder(nn.Module):
    """Reference `Encoder` (`model/self_attention_VAT.py:884-906`)."""
    ds_ksize: Sequence[int] = (2, 2)
    ds_stride: Sequence[int] = (2, 2)
    dtype: str | None = None

    def setup(self):
        kw = dict(ds_ksize=self.ds_ksize, ds_stride=self.ds_stride,
                  dtype=self.dtype)
        self.block1 = EncBlock(16, **kw)
        self.block2 = EncBlock(32, **kw)
        self.block3 = EncBlock(64, **kw)
        self.block4 = EncBlock(128, **kw)
        self.conv1 = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.conv2 = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.conv3 = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=torch_conv_init, dtype=self.dtype)

    def __call__(self, x, train: bool):
        x1, s1 = self.block1(x, train)
        x2, s2 = self.block2(x1, train)
        x3, s3 = self.block3(x2, train)
        x4, s4 = self.block4(x3, train)
        c1 = self.conv1(x3)
        c2 = self.conv2(x2)
        c3 = self.conv3(x1)
        return x4, [s1, s2, s3, s4], [c1, c2, c3, x1]


class Decoder(nn.Module):
    """Reference `Decoder`, decoder head width = `num_instruments`
    (`model/self_attention_VAT.py:908-926`, `model/UNet_onset.py:250-268`)."""
    num_instruments: int = 1
    ds_ksize: Sequence[int] = (2, 2)
    ds_stride: Sequence[int] = (2, 2)
    dtype: str | None = None

    def setup(self):
        kw = dict(ds_ksize=self.ds_ksize, ds_stride=self.ds_stride,
                  dtype=self.dtype)
        self.d_block1 = DBlock(192, 64, False, **kw)
        self.d_block2 = DBlock(96, 32, False, **kw)
        self.d_block3 = DBlock(48, 16, False, **kw)
        self.d_block4 = DBlock(16, self.num_instruments, True, **kw)

    def __call__(self, x, s, c, train: bool):
        x = self.d_block1(x, s[3], c[0], train)
        x = self.d_block2(x, s[2], c[1], train)
        x = self.d_block3(x, s[1], c[2], train)
        x = self.d_block4(x, s[0], None, train)
        return x  # no activation (heads apply their own sigmoid)
