"""Device-side spectrogram frontends (XLA path).

TPU-first design: the STFT is framing + two MXU matmuls against precomputed
windowed DFT bases (mathematically identical to the reference's conv1d
against Fourier kernels, reference `model/Spectrogram.py:219-231`), and the
mel projection is one more matmul. The CQT runs as a strided convolution
against precomputed complex kernels (reference `model/Spectrogram.py:1318-1328`).

Outputs are time-major `(batch, frames, bins)` — the layout every model here
consumes — instead of the reference's `(batch, bins, frames)` + transpose.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import filterbanks as fb


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, L) -> (B, T, frame_length) overlapping frames, T = (L-len)//hop+1."""
    n_frames = (x.shape[-1] - frame_length) // hop + 1
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(frame_length)[None, :])
    return x[..., idx]


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if x.shape[-1] <= pad:
        raise ValueError("signal shorter than reflect padding length")
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


class STFT:
    """Magnitude / power STFT via framing + DFT matmuls.

    Equivalent to the reference conv-based STFT with `freq_scale='no'`,
    `center=True`, reflect padding (reference `model/Spectrogram.py:104-231`).
    """

    def __init__(self, n_fft: int = 2048, win_length: int | None = None,
                 freq_bins: int | None = None, hop_length: int | None = None,
                 window: str = "hann", center: bool = True,
                 pad_mode: str = "reflect",
                 precision: jax.lax.Precision = jax.lax.Precision.HIGHEST):
        win_length = win_length or n_fft
        self.n_fft = n_fft
        self.hop_length = hop_length or win_length // 4
        self.center = center
        self.pad_mode = pad_mode
        self.pad_amount = n_fft // 2
        self.precision = precision
        wcos, wsin = fb.fourier_kernels(n_fft, win_length, freq_bins, window)
        # (n_fft, bins) for right-multiplication of frames.
        self.wcos = jnp.asarray(wcos.T)
        self.wsin = jnp.asarray(wsin.T)

    def power(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, T, bins) power spectrogram |STFT|^2."""
        if self.center:
            if self.pad_mode == "reflect":
                x = reflect_pad(x, self.pad_amount)
            else:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                            + [(self.pad_amount, self.pad_amount)])
        frames = _frame(x, self.n_fft, self.hop_length)
        real = jnp.matmul(frames, self.wcos, precision=self.precision)
        imag = jnp.matmul(frames, self.wsin, precision=self.precision)
        return real * real + imag * imag

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Magnitude STFT, (B, T, bins)."""
        return jnp.sqrt(self.power(x))


class MelSpectrogram:
    """|STFT|^power projected onto a librosa-compatible mel filterbank.

    Matches reference nnAudio MelSpectrogram (`model/Spectrogram.py:396-461`):
    power=2.0, slaney mel with norm=1, htk=False.
    """

    def __init__(self, sr: int = 22050, n_fft: int = 2048,
                 win_length: int | None = None, n_mels: int = 128,
                 hop_length: int = 512, window: str = "hann",
                 center: bool = True, pad_mode: str = "reflect",
                 power: float = 2.0, htk: bool = False,
                 fmin: float = 0.0, fmax: float | None = None, norm: int = 1,
                 precision: jax.lax.Precision = jax.lax.Precision.HIGHEST):
        self.stft = STFT(n_fft=n_fft, win_length=win_length,
                         hop_length=hop_length, window=window, center=center,
                         pad_mode=pad_mode, precision=precision)
        self.power_exp = power
        self.precision = precision
        basis = fb.mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm)
        self.mel_basis = jnp.asarray(basis.T)  # (bins, n_mels)
        self.n_mels = n_mels

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, T, n_mels)."""
        if self.power_exp == 2.0:
            spec = self.stft.power(x)
        else:
            spec = jnp.sqrt(self.stft.power(x)) ** self.power_exp
        return jnp.matmul(spec, self.mel_basis, precision=self.precision)


class CQT1992v2:
    """Constant-Q transform by direct convolution with complex CQT kernels.

    Matches reference CQT1992v2 (`model/Spectrogram.py:1246-1329`): one hop,
    reflect center-padding of kernel_width//2, magnitude scaled by
    sqrt(kernel length per bin).
    """

    def __init__(self, sr: int = 22050, hop_length: int = 512,
                 fmin: float = 32.70, fmax: float | None = None,
                 n_bins: int = 84, bins_per_octave: int = 12, norm: int = 1,
                 window: str = "hann", center: bool = True,
                 pad_mode: str = "reflect",
                 precision: jax.lax.Precision = jax.lax.Precision.HIGHEST):
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.precision = precision
        q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
        kernels, self.kernel_width, lengths = fb.cqt_kernels(
            q, sr, fmin, n_bins, bins_per_octave, norm, window, fmax)
        # Conv kernels in OIW layout (out_ch, in_ch=1, width).
        self.kr = jnp.asarray(kernels.real[:, None, :])
        self.ki = jnp.asarray(kernels.imag[:, None, :])
        self.sqrt_lengths = jnp.asarray(np.sqrt(lengths))[None, :, None]
        self.n_bins = n_bins

    def _conv(self, x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(self.hop_length,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"), precision=self.precision)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, T, n_bins) CQT magnitude."""
        if self.center:
            pad = self.kernel_width // 2
            if self.pad_mode == "reflect":
                x = reflect_pad(x, pad)
            else:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        x = x[:, None, :]
        real = self._conv(x, self.kr) * self.sqrt_lengths
        imag = -self._conv(x, self.ki) * self.sqrt_lengths
        mag = jnp.sqrt(real * real + imag * imag)
        return jnp.swapaxes(mag, 1, 2)  # (B, T, bins)


def make_frontend(spec: str = "Mel", sr: int | None = None,
                  hop_length: int | None = None, n_bins: int | None = None,
                  precision=jax.lax.Precision.HIGHEST):
    """Frontend factory mirroring the reference model constructors
    (`model/self_attention_VAT.py:1019-1039`). Returns (frontend, n_bins)."""
    from .. import constants as C
    sr = sr or C.SAMPLE_RATE
    hop_length = hop_length or C.HOP_LENGTH
    if spec == "Mel":
        n_bins = n_bins or C.N_BINS
        return MelSpectrogram(sr=sr, win_length=C.WINDOW_LENGTH,
                              n_fft=C.WINDOW_LENGTH, n_mels=n_bins,
                              hop_length=hop_length, fmin=C.MEL_FMIN,
                              fmax=C.MEL_FMAX, precision=precision), n_bins
    if spec == "CQT":
        r = 2
        n_bins = n_bins or 88 * r
        return CQT1992v2(sr=sr, hop_length=hop_length, n_bins=n_bins,
                         fmin=27.5, bins_per_octave=12 * r,
                         precision=precision), n_bins
    raise ValueError(f"unknown spectrogram type: {spec}")
