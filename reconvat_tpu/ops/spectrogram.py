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

import jax
import jax.numpy as jnp
import numpy as np

from . import filterbanks as fb


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, L) -> (B, T, frame_length) overlapping frames, T = (L-len)//hop+1.

    When hop divides frame_length (the 512 | 2048 default), frames are four
    concatenated strided row views — pure slicing that XLA fuses into the
    downstream DFT matmul, instead of a T x frame_length gather.
    """
    n_frames = (x.shape[-1] - frame_length) // hop + 1
    if frame_length % hop == 0:
        k = frame_length // hop
        n_rows = x.shape[-1] // hop
        rows = x[..., :n_rows * hop].reshape(*x.shape[:-1], n_rows, hop)
        parts = [rows[..., i:n_frames + i, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
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
        self.sqrt_lengths = jnp.asarray(np.sqrt(lengths))[None, None, :]
        self.n_bins = n_bins
        if self.kernel_width % hop_length == 0:
            # hop-chunked kernel matrices for the matmul path:
            # (k, hop, n_bins) where chunk j covers taps [j*hop, (j+1)*hop)
            k = self.kernel_width // hop_length
            kr = kernels.real.reshape(n_bins, k, hop_length)
            ki = kernels.imag.reshape(n_bins, k, hop_length)
            self.kr_chunks = jnp.asarray(
                np.ascontiguousarray(kr.transpose(1, 2, 0)))
            self.ki_chunks = jnp.asarray(
                np.ascontiguousarray(ki.transpose(1, 2, 0)))
        else:
            self.kr_chunks = None

    def _conv(self, x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(self.hop_length,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"), precision=self.precision)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, T, n_bins) CQT magnitude.

        When hop | kernel_width (the 512 | 32768 default geometry), the
        32768-tap strided conv is evaluated as 64 accumulated MXU matmuls
        over hop-sized row chunks — ~300x faster on TPU than XLA's
        lowering of the direct conv (367 ms -> ~1 ms at B=8)."""
        if self.center:
            pad = self.kernel_width // 2
            if self.pad_mode == "reflect":
                x = reflect_pad(x, pad)
            else:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])

        if self.kr_chunks is not None:
            B, Lp = x.shape
            hop = self.hop_length
            k = self.kernel_width // hop
            n_frames = (Lp - self.kernel_width) // hop + 1
            n_rows = Lp // hop
            rows = x[:, :n_rows * hop].reshape(B, n_rows, hop)
            need = n_frames + k - 1
            if n_rows < need:
                rows = jnp.pad(rows, ((0, 0), (0, need - n_rows), (0, 0)))
            real = None
            imag = None
            for j in range(k):
                rj = rows[:, j:j + n_frames]             # (B, T, hop)
                re_j = jnp.matmul(rj, self.kr_chunks[j],
                                  precision=self.precision)
                im_j = jnp.matmul(rj, self.ki_chunks[j],
                                  precision=self.precision)
                real = re_j if real is None else real + re_j
                imag = im_j if imag is None else imag + im_j
            real = real * self.sqrt_lengths
            imag = -imag * self.sqrt_lengths
            return jnp.sqrt(real * real + imag * imag)   # (B, T, bins)

        xc = x[:, None, :]
        sq = jnp.swapaxes(self.sqrt_lengths, 1, 2)       # (1, bins, 1)
        real = self._conv(xc, self.kr) * sq
        imag = -self._conv(xc, self.ki) * sq
        mag = jnp.sqrt(real * real + imag * imag)
        return jnp.swapaxes(mag, 1, 2)  # (B, T, bins)


class CFP:
    """Combined Frequency and Periodicity frontend.

    Port of reference `Combined_Frequency_Periodicity`
    (`model/Spectrogram.py:2093-2233`): blackman-harris STFT magnitude ->
    iterated real-FFT nonlinearity cascade between spectrum and cepstrum
    (g = [0.24, 0.6, 1]) -> log-frequency and log-quefrency triangular
    projections -> elementwise product Z = tfrLF * tfrLQ.

    Output is time-major (B, T, n_bins); n_bins = quef2logfreq rows
    (reference drops the first and last STFT frame, preserved here).
    """

    def __init__(self, fr=2, fs=16000, hop_length=320, window_size=2049,
                 fc=80, tc=1 / 1000, g=(0.24, 0.6, 1), num_per_oct=48):
        import scipy.signal

        self.window_size = window_size
        self.hop_length = hop_length
        self.N = int(fs / float(fr))
        f = fs * np.linspace(0, 0.5, round(self.N // 2), endpoint=True)
        try:
            h = scipy.signal.windows.blackmanharris(window_size)
        except AttributeError:
            h = scipy.signal.blackmanharris(window_size)
        self.h = h.astype(np.float32)
        self.g = list(g)
        self.tc_idx = round(fs * tc)
        self.fc_idx = round(fc / fr)
        self.high_freq_idx = int(round((1 / tc) / fr) + 1)
        self.high_quef_idx = int(round(fs / fc) + 1)
        self.f = f[:self.high_freq_idx]
        self.q = np.arange(self.high_quef_idx) / float(fs)

        f2lf, q2lf = self._create_logfreq_matrices(self.f, self.q, fr, fc,
                                                   tc, num_per_oct, fs)
        self.freq2logfreq_matrix = jnp.asarray(f2lf.astype(np.float32))
        self.quef2logfreq_matrix = jnp.asarray(q2lf.astype(np.float32))
        self.n_bins = q2lf.shape[0]
        # precompute the centered window (padded to N) used by torch.stft
        self.window_full = jnp.asarray(
            fb.pad_center(self.h, self.N).astype(np.float32))
        self.h_norm = float(np.linalg.norm(self.h))

    def _nonlinear(self, X, g, cutoff):
        cutoff = int(cutoff)
        n = X.shape[-1]
        mask = np.ones(n, dtype=np.float32)
        mask[:cutoff] = 0
        mask[n - cutoff:] = 0
        if g != 0:
            X = jnp.maximum(X, 0.0) * mask
            return X ** g
        return jnp.log(X) * mask

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, T-2, n_bins)."""
        N = self.N
        pad = N // 2
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        frames = _frame(xp, N, self.hop_length) * self.window_full
        spec_c = jnp.fft.fft(frames, axis=-1)
        tfr0 = jnp.abs(spec_c).astype(jnp.float32) / self.h_norm
        tfr0 = tfr0[:, 1:-1]                       # drop first/last frame

        spec = jnp.maximum(tfr0, 0.0) ** self.g[0]
        ceps = jnp.zeros_like(spec)
        for gc in range(1, len(self.g)):
            if gc % 2 == 1:
                ceps = jnp.real(jnp.fft.fft(spec, axis=-1)) / np.sqrt(N)
                ceps = self._nonlinear(ceps, self.g[gc], self.tc_idx)
            else:
                spec = jnp.real(jnp.fft.fft(ceps, axis=-1)) / np.sqrt(N)
                spec = self._nonlinear(spec, self.g[gc], self.fc_idx)

        half = int(round(N / 2))
        tfr = spec[:, :, :half][:, :, :self.high_freq_idx]
        cep = ceps[:, :, :half][:, :, :self.high_quef_idx]
        tfrLF = jnp.einsum("nf,btf->btn", self.freq2logfreq_matrix, tfr)
        tfrLQ = jnp.einsum("nq,btq->btn", self.quef2logfreq_matrix, cep)
        return tfrLF * tfrLQ                       # (B, T, n_bins)

    @staticmethod
    def _create_logfreq_matrices(f, q, fr, fc, tc, num_per_oct, fs):
        """Reference `create_logfreq_matrix`
        (`model/Spectrogram.py:2193-2233`)."""
        start_freq, stop_freq = fc, 1 / tc
        nest = int(np.ceil(np.log2(stop_freq / start_freq)) * num_per_oct)
        central_freq = []
        for i in range(nest):
            cen = start_freq * 2.0 ** (i / num_per_oct)
            if cen < stop_freq:
                central_freq.append(cen)
            else:
                break
        nest = len(central_freq)
        freq_band = np.zeros((nest - 1, len(f)))
        for i in range(1, nest - 1):
            l = int(round(central_freq[i - 1] / fr))
            r = int(round(central_freq[i + 1] / fr) + 1)
            if l >= r - 1:
                freq_band[i, l] = 1
            else:
                for j in range(l, min(r, len(f))):
                    if central_freq[i - 1] < f[j] < central_freq[i]:
                        freq_band[i, j] = ((f[j] - central_freq[i - 1])
                                           / (central_freq[i]
                                              - central_freq[i - 1]))
                    elif central_freq[i] < f[j] < central_freq[i + 1]:
                        freq_band[i, j] = ((central_freq[i + 1] - f[j])
                                           / (central_freq[i + 1]
                                              - central_freq[i]))
        with np.errstate(divide="ignore"):
            finv = 1 / q
        quef_band = np.zeros((nest - 1, len(finv)))
        for i in range(1, nest - 1):
            lo = int(round(fs / central_freq[i + 1]))
            hi = int(round(fs / central_freq[i - 1]) + 1)
            for j in range(lo, min(hi, len(finv))):
                if central_freq[i - 1] < finv[j] < central_freq[i]:
                    quef_band[i, j] = ((finv[j] - central_freq[i - 1])
                                       / (central_freq[i]
                                          - central_freq[i - 1]))
                elif central_freq[i] < finv[j] < central_freq[i + 1]:
                    quef_band[i, j] = ((central_freq[i + 1] - finv[j])
                                       / (central_freq[i + 1]
                                          - central_freq[i]))
        return freq_band, quef_band


def frontend_precision(compute_dtype):
    """Frontend matmul precision, following the model's compute mode.

    Measured on a v5e chip (B=32 mel + log + imagewise-normalize
    pipeline): HIGHEST 8.70 ms, HIGH 5.23 ms, DEFAULT 3.07 ms per
    forward, with max normalized-logspec deviation 0 / 6.6e-5 / 9.8e-3
    vs HIGHEST. bf16 mixed-precision mode uses HIGH (1.66x, error two
    orders below the model-side bf16 tolerance); full-fp32 mode keeps
    exact-parity HIGHEST. DEFAULT is measurably lossy — not used.
    """
    return (jax.lax.Precision.HIGH if compute_dtype
            else jax.lax.Precision.HIGHEST)


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
        # RECONVAT_MEL_IMPL=pallas swaps in the fused Pallas STFT+mel
        # kernel (ops/pallas_mel.py). Default XLA: measured on v5e the
        # XLA framing-matmul frontend wins inside both the B=128 serving
        # pipeline and the train step (see bench_logs/r5_mel_ab.log,
        # tools/bench_mel_ab.py) — the mel is a tiny slice of either
        # graph and XLA fuses it with the surrounding log/normalize.
        import os
        if os.environ.get("RECONVAT_MEL_IMPL", "xla") == "pallas":
            from .pallas_mel import PallasMelSpectrogram

            return PallasMelSpectrogram(
                sr=sr, win_length=C.WINDOW_LENGTH, n_fft=C.WINDOW_LENGTH,
                n_mels=n_bins, hop_length=hop_length, fmin=C.MEL_FMIN,
                fmax=C.MEL_FMAX, precision=precision), n_bins
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
    if spec == "CFP":
        # reference `UNet` CFP config (`model/self_attention_VAT.py:1031-1037`)
        frontend = CFP(fs=sr, fr=4, window_size=C.WINDOW_LENGTH,
                       hop_length=hop_length, fc=C.MEL_FMIN,
                       tc=1 / C.MEL_FMAX)
        return frontend, frontend.n_bins
    raise ValueError(f"unknown spectrogram type: {spec}")
