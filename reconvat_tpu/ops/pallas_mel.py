"""Pallas TPU kernel: fused STFT + mel filterbank frontend.

The BASELINE north star names this kernel explicitly: the reference's
conv-based nnAudio frontend (reflect-pad -> conv1d against Fourier kernels
-> magnitude^2 -> mel matmul, `model/Spectrogram.py:219-231,443-461`)
becomes one fused program. Per (batch, frame-block, freq-block) grid step:

    rows  = hop-sized slices of the padded audio        (VMEM)
    frames = concat of 4 shifted row views              (hop | n_fft)
    re/im  = frames @ Wcos_blk / frames @ Wsin_blk      (MXU)
    power  = re^2 + im^2                                (VPU)
    mel   += power @ M_blk                              (MXU, accumulated
                                                         over freq blocks)

The DFT weight matrices never fit VMEM whole (2 x 2048 x 1025 fp32); the
freq-block grid axis streams them through while the mel output block stays
resident and accumulates — the classic reduction-grid pattern.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import filterbanks as fb


def _round_up(x, m):
    return -(-x // m) * m


def _mel_kernel(rows_ref, wcos_ref, wsin_ref, mel_ref, o_ref, *,
                frames_per_block: int, k: int, hop: int):
    fb_idx = pl.program_id(2)

    # frames = concat_j rows_j would need sublane-offset vector concats
    # (unsupported by Mosaic); instead the DFT matmul distributes over the
    # k hop-chunks of each frame: frames @ W == sum_j rows_j @ W_j.
    dims = (((1,), (0,)), ((), ()))
    re = None
    im = None
    for j in range(k):
        rj = rows_ref[0, 0, j]                       # (fpb, hop)
        wc = wcos_ref[j * hop:(j + 1) * hop, :]
        ws = wsin_ref[j * hop:(j + 1) * hop, :]
        re_j = jax.lax.dot_general(
            rj, wc, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        im_j = jax.lax.dot_general(
            rj, ws, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        re = re_j if re is None else re + re_j
        im = im_j if im is None else im + im_j
    power = re * re + im * im              # (fpb, freq_block)

    partial = jax.lax.dot_general(
        power, mel_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(fb_idx == 0)
    def _():
        o_ref[0] = partial

    @pl.when(fb_idx != 0)
    def _():
        o_ref[0] = o_ref[0] + partial


class PallasMelSpectrogram:
    """Drop-in fused replacement for ops.spectrogram.MelSpectrogram
    (power=2.0 path). Same constructor surface as the XLA class."""

    def __init__(self, sr=22050, n_fft=2048, win_length=None, n_mels=128,
                 hop_length=512, window="hann", center=True,
                 pad_mode="reflect", fmin=0.0, fmax=None, norm=1,
                 htk=False, power=2.0, frames_per_block=160,
                 freq_block=256, precision=None):
        # frames_per_block=160: the production 640-frame window splits
        # evenly (no padded-frame waste) and the per-step VMEM footprint
        # (rows 1.3M + 2x2M DFT weights + mel/out blocks, double-buffered)
        # stays under the 16M scoped limit — 640 blows it at B=128
        # (18M > 16M compile error, bench_logs/r5_mel_ab.log history)
        assert power == 2.0, "fused kernel implements the power=2 path"
        assert n_fft % hop_length == 0, \
            "fused kernel needs hop | n_fft (512 | 2048 default)"
        self.n_fft = n_fft
        self.hop = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.n_mels = n_mels
        self.k = n_fft // hop_length
        self.frames_per_block = frames_per_block
        n_freq = n_fft // 2 + 1
        self.freq_block = freq_block
        self.n_freq_pad = _round_up(n_freq, freq_block)
        self.mels_pad = _round_up(n_mels, 128)

        wcos, wsin = fb.fourier_kernels(n_fft, win_length or n_fft,
                                        None, window)
        wcos = np.pad(wcos.T, ((0, 0), (0, self.n_freq_pad - n_freq)))
        wsin = np.pad(wsin.T, ((0, 0), (0, self.n_freq_pad - n_freq)))
        basis = fb.mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm)
        basis = np.pad(basis.T, ((0, self.n_freq_pad - n_freq),
                                 (0, self.mels_pad - n_mels)))
        self.wcos = jnp.asarray(wcos)          # (n_fft, n_freq_pad)
        self.wsin = jnp.asarray(wsin)
        self.mel_basis = jnp.asarray(basis)    # (n_freq_pad, mels_pad)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, T, n_mels) mel power spectrogram."""
        B, L = x.shape
        if self.center:
            pad = self.n_fft // 2
            if self.pad_mode == "reflect":
                x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
            else:
                x = jnp.pad(x, ((0, 0), (pad, pad)))
        Lp = x.shape[1]
        n_frames = (Lp - self.n_fft) // self.hop + 1
        fpb = min(self.frames_per_block, _round_up(max(n_frames, 8), 8))
        nb = -(-n_frames // fpb)
        rows_per_block = fpb + self.k - 1
        total_rows = nb * fpb + self.k - 1

        rows = x[:, :Lp - (Lp % self.hop)] if Lp % self.hop else x
        n_rows = rows.shape[1] // self.hop
        rows = rows[:, :n_rows * self.hop].reshape(B, n_rows, self.hop)
        if n_rows < total_rows:
            rows = jnp.pad(rows, ((0, 0), (0, total_rows - n_rows), (0, 0)))
        # per hop-chunk shifted views: shifted[j][i] covers frames'
        # j-th hop chunk for frame block i — aligned reads in the kernel
        shifted = jnp.stack(
            [rows[:, j:j + nb * fpb].reshape(B, nb, fpb, self.hop)
             for j in range(self.k)], axis=2)  # (B, nb, k, fpb, hop)

        nfb = self.n_freq_pad // self.freq_block
        kernel = functools.partial(_mel_kernel, frames_per_block=fpb,
                                   k=self.k, hop=self.hop)
        out = pl.pallas_call(
            kernel,
            grid=(B, nb, nfb),
            in_specs=[
                pl.BlockSpec((1, 1, self.k, fpb, self.hop),
                             lambda b, i, f: (b, i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.n_fft, self.freq_block),
                             lambda b, i, f: (0, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.n_fft, self.freq_block),
                             lambda b, i, f: (0, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.freq_block, self.mels_pad),
                             lambda b, i, f: (f, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, fpb, self.mels_pad),
                                   lambda b, i, f: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nb * fpb, self.mels_pad),
                                           jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(shifted, self.wcos, self.wsin, self.mel_basis)

        return out[:, :n_frames, :self.n_mels]
