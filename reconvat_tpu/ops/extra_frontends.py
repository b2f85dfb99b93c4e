"""Frontend surface completeness: MFCC, Gammatonegram, DFT, iSTFT,
Griffin-Lim, CQT1992, CQT2010, CQT2010v2.

None of these are reachable from the reference's shipped entry points
(SURVEY §2.1 "other frontend classes"), but they are part of the vendored
nnAudio surface (`model/Spectrogram.py:469-711,932-1161,1654-2092`) and are
provided here as library frontends. All device code is jnp/XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import filterbanks as fb
from .spectrogram import STFT, MelSpectrogram, _frame, reflect_pad


class MFCC:
    """Mel spectrogram -> power_to_db -> orthonormal DCT-II
    (reference `MFCC`, `model/Spectrogram.py:469-591`)."""

    def __init__(self, sr=22050, n_mfcc=20, norm="ortho", ref=1.0,
                 amin=1e-10, top_db=80.0, **kwargs):
        self.melspec = MelSpectrogram(sr=sr, **kwargs)
        self.n_mfcc = n_mfcc
        self.norm = norm
        self.amin = float(amin)
        self.ref = abs(float(ref))
        self.top_db = top_db

    def _power_to_db(self, S):
        log_spec = 10.0 * jnp.log10(jnp.maximum(S, self.amin))
        log_spec = log_spec - 10.0 * jnp.log10(max(self.amin, self.ref))
        if self.top_db is not None:
            batch_max = jnp.max(log_spec.reshape(log_spec.shape[0], -1),
                                axis=1)[:, None, None]
            log_spec = jnp.maximum(log_spec, batch_max - self.top_db)
        return log_spec

    def _dct(self, x):
        """Orthonormal DCT-II over the last axis."""
        N = x.shape[-1]
        k = np.arange(self.n_mfcc)[:, None]
        n = np.arange(N)[None, :]
        basis = np.cos(np.pi * k * (2 * n + 1) / (2 * N))
        if self.norm == "ortho":
            basis[0] *= 1.0 / np.sqrt(N)
            basis[1:] *= np.sqrt(2.0 / N)
        else:
            basis *= 2.0
        return jnp.matmul(x, jnp.asarray(basis.T.astype(np.float32)))

    def __call__(self, x):
        """(B, L) -> (B, T, n_mfcc)."""
        mel = self.melspec(x)                   # (B, T, n_mels)
        db = self._power_to_db(mel)
        return self._dct(db)


class Gammatonegram:
    """|STFT|^power projected on a 4th-order gammatone filterbank
    (reference `Gammatonegram`, `model/Spectrogram.py:594-709`)."""

    def __init__(self, sr=44100, n_fft=2048, n_bins=64, hop_length=512,
                 window="hann", center=True, pad_mode="reflect", power=2.0,
                 fmin=20.0, fmax=None,
                 precision=jax.lax.Precision.HIGHEST):
        self.stft = STFT(n_fft=n_fft, hop_length=hop_length, window=window,
                         center=center, pad_mode=pad_mode,
                         precision=precision)
        self.power = power
        basis = fb.gammatone_filterbank(sr, n_fft, n_bins, fmin, fmax)
        self.basis = jnp.asarray(basis.T)       # (bins, n_bins)
        self.precision = precision

    def __call__(self, x):
        """(B, L) -> (B, T, n_bins)."""
        mag = jnp.sqrt(self.stft.power(x)) ** self.power
        return jnp.matmul(mag, self.basis, precision=self.precision)


class DFT:
    """Full (two-sided) DFT returning (real, imag)
    (reference `DFT`, `model/Spectrogram.py:1654-1752`)."""

    def __init__(self, n_fft=2048, hop_length=512, window="hann",
                 center=True, pad_mode="reflect"):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.window = jnp.asarray(
            fb.pad_center(fb.get_window(window, n_fft), n_fft)
            .astype(np.float32))

    def _frames(self, x):
        if self.center:
            pad = self.n_fft // 2
            if self.pad_mode == "reflect":
                x = reflect_pad(x, pad)
            else:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        return _frame(x, self.n_fft, self.hop_length) * self.window

    def __call__(self, x):
        """(B, L) -> (real (B, T, n_fft), imag (B, T, n_fft))."""
        spec = jnp.fft.fft(self._frames(x), axis=-1)
        return jnp.real(spec), jnp.imag(spec)

    def inverse(self, real, imag, length=None):
        frames = jnp.fft.ifft(real + 1j * imag, axis=-1).real
        return overlap_add(frames * self.window, self.hop_length,
                           self.window, self.n_fft, self.center, length)


def overlap_add(frames, hop, window, n_fft, center=True, length=None):
    """Windowed overlap-add with window-sum-square normalization
    (reference iSTFT tail, `model/Spectrogram.py:283-311`)."""
    B, T, N = frames.shape
    total = (T - 1) * hop + N
    sig = jnp.zeros((B, total))
    wss = np.zeros(total)
    win_np = np.asarray(window) ** 2
    idx = np.arange(N)
    for t in range(T):
        sl = slice(t * hop, t * hop + N)
        wss[sl] += win_np
    # scatter-add via segment trick: build with dynamic_update is O(T);
    # use the same 4-row concat structure instead when hop | N
    if N % hop == 0:
        k = N // hop
        parts = jnp.zeros((k, B, total))
        chunks = frames.reshape(B, T, k, hop)
        for j in range(k):
            row = chunks[:, :, j, :].reshape(B, T * hop)
            parts = parts.at[j, :, j * hop:j * hop + T * hop].set(row)
        sig = parts.sum(axis=0)
    else:
        for t in range(T):
            sig = sig.at[:, t * hop:t * hop + N].add(frames[:, t])
    nz = wss > 1e-10
    denom = np.where(nz, wss, 1.0)
    sig = sig / jnp.asarray(denom.astype(np.float32))
    pad = n_fft // 2
    if length is None:
        if center:
            sig = sig[:, pad:-pad]
    else:
        if center:
            sig = sig[:, pad:pad + length]
        else:
            sig = sig[:, :length]
    return sig


class ISTFT:
    """Inverse STFT from complex spectrograms (reference `iSTFT`,
    `model/Spectrogram.py:1753-1961` and `STFT.inverse`:239-311)."""

    def __init__(self, n_fft=2048, hop_length=None, window="hann",
                 center=True):
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 4
        self.center = center
        self.window = jnp.asarray(
            fb.pad_center(fb.get_window(window, n_fft), n_fft)
            .astype(np.float32))

    def __call__(self, real, imag, onesided=True, length=None):
        """real/imag (B, T, bins) -> waveform (B, L)."""
        if onesided:
            spec = real + 1j * imag
            frames = jnp.fft.irfft(spec, n=self.n_fft, axis=-1)
        else:
            frames = jnp.fft.ifft(real + 1j * imag, axis=-1).real
        return overlap_add(frames * self.window, self.hop_length,
                           self.window, self.n_fft, self.center, length)


class GriffinLim:
    """Griffin-Lim phase retrieval with momentum (reference `Griffin_Lim`,
    `model/Spectrogram.py:1962-2092`)."""

    def __init__(self, n_fft=2048, hop_length=None, window="hann",
                 center=True, n_iter=32, momentum=0.99):
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 4
        self.n_iter = n_iter
        self.momentum = momentum
        self.stft = STFT(n_fft=n_fft, hop_length=self.hop_length,
                         window=window, center=center)
        self.istft = ISTFT(n_fft=n_fft, hop_length=self.hop_length,
                           window=window, center=center)

    def _stft_complex(self, x):
        frames = _frame(reflect_pad(x, self.n_fft // 2), self.n_fft,
                        self.hop_length)
        win = self.istft.window
        return jnp.fft.rfft(frames * win, axis=-1)

    def __call__(self, magnitude, key=None, length=None):
        """magnitude (B, T, bins) -> waveform (B, L)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        angles = jnp.exp(1j * jax.random.uniform(
            key, magnitude.shape, minval=-np.pi, maxval=np.pi))
        rebuilt = jnp.zeros_like(angles)
        for _ in range(self.n_iter):
            tprev = rebuilt
            inverse = self.istft(jnp.real(magnitude * angles),
                                 jnp.imag(magnitude * angles),
                                 length=length)
            rebuilt = self._stft_complex(inverse)
            update = rebuilt - (self.momentum / (1 + self.momentum)) * tprev
            angles = update / jnp.maximum(jnp.abs(update), 1e-16)
        return self.istft(jnp.real(magnitude * angles),
                          jnp.imag(magnitude * angles), length=length)


class CQT1992:
    """Frequency-domain CQT (Brown & Puckette 1992), the legacy v1 class
    (reference `model/Spectrogram.py:712-931`).

    Unlike `CQT1992v2` (direct time-domain convolution against complex CQT
    kernels), the 1992 algorithm takes one large unwindowed DFT per hop and
    multiplies it with the FFT'd CQT kernels, keeping only the positive
    half-spectrum. With `complex_mul` + the reference's `(re, -im)` stacking
    this reduces to `conj(fft(kernels)) @ rfft(frame)` — we compute the
    frame DFT with `jnp.fft.rfft` (an O(kw log kw) XLA FFT instead of the
    reference's O(kw^2) conv against explicit sin/cos kernels, which at
    kernel widths of 2^15 would be a 0.5-GFLOP matmul per frame).
    """

    def __init__(self, sr=22050, hop_length=512, fmin=220, fmax=None,
                 n_bins=84, bins_per_octave=12, norm=1, window="hann",
                 center=True, pad_mode="reflect"):
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.norm = norm

        q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
        if fmax is not None:
            # reference create_cqt_kernels: fmax overrides n_bins
            n_bins = int(np.ceil(bins_per_octave * np.log2(fmax / fmin)))
        kernels, self.kernel_width, lengths = fb.cqt_kernels(
            q, sr, fmin, n_bins, bins_per_octave, norm, window)
        # conj(fft(kernels)) over the positive half-spectrum; transposed
        # for right-multiplying (B, T, bins) rfft frames
        spec = np.fft.fft(kernels, axis=1)[:, :self.kernel_width // 2 + 1]
        self.kernel_spec = jnp.asarray(np.conj(spec).T.astype(np.complex64))
        self.sqrt_lengths = jnp.asarray(np.sqrt(lengths))
        self.n_bins = n_bins

    def _complex(self, x):
        """(B, L) -> (B, T, n_bins) complex CQT."""
        if self.center:
            pad = self.kernel_width // 2
            if self.pad_mode == "reflect":
                x = reflect_pad(x, pad)
            else:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        frames = _frame(x, self.kernel_width, self.hop_length)
        X = jnp.fft.rfft(frames, axis=-1)
        out = jnp.matmul(X, self.kernel_spec)
        if self.norm:
            out = out / self.kernel_width * self.sqrt_lengths
        else:
            out = out * self.sqrt_lengths
        return out

    def __call__(self, x, output_format="Magnitude"):
        out = self._complex(x)
        if output_format == "Magnitude":
            return jnp.abs(out)
        if output_format == "Complex":
            return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)
        if output_format == "Phase":
            ang = jnp.angle(out)
            return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        raise ValueError(output_format)


def _firwin2_lowpass(band_center: float, kernel_length: int = 256,
                     transition_bandwidth: float = 0.03) -> np.ndarray:
    """nnAudio's `create_lowpass_filter`: firwin2 with unit gain up to
    band_center/(1+tb) and zero gain from band_center*(1+tb)."""
    import scipy.signal

    passband_max = band_center / (1 + transition_bandwidth)
    stopband_min = band_center * (1 + transition_bandwidth)
    taps = scipy.signal.firwin2(kernel_length,
                                [0.0, passband_max, stopband_min, 1.0],
                                [1.0, 1.0, 0.0, 0.0])
    return taps.astype(np.float32)


class CQT2010:
    """Multi-octave frequency-domain CQT (Schoerkhuber & Klapuri 2010), the
    legacy v1 class (reference `model/Spectrogram.py:932-1161`): top-octave
    frequency-domain kernels reused across octaves with successive x2
    decimation, plus optional early downsampling when the top octave sits
    far below Nyquist.

    Reference bug (not replicated): the vendored snapshot's forward passes
    the raw DFT kernels `wcos/wsin` to `get_cqt_complex`
    (`model/Spectrogram.py:1123-1129`), which just convolves with whatever
    kernels it is given — so the frequency-domain CQT basis it constructs
    (`model/Spectrogram.py:1055-1057`) is never applied and the output rows
    are linear-frequency DFT bins. We implement the published algorithm
    (upstream nnAudio's `get_cqt`): per-octave DFT followed by the
    half-spectrum kernel multiply, exactly as in `CQT1992` above.
    """

    def __init__(self, sr=22050, hop_length=512, fmin=32.70, fmax=None,
                 n_bins=84, bins_per_octave=12, norm=True, basis_norm=1,
                 window="hann", pad_mode="reflect", earlydownsample=True):
        self.pad_mode = pad_mode
        self.n_bins = n_bins
        self.norm = norm

        q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
        self.n_octaves = int(np.ceil(n_bins / bins_per_octave))
        n_filters = min(bins_per_octave, n_bins)

        # top-octave frequency range (reference `model/Spectrogram.py:994-1008`)
        fmin_t = fmin * 2.0 ** (self.n_octaves - 1)
        remainder = n_bins % bins_per_octave
        if remainder == 0:
            fmax_t = fmin_t * 2.0 ** ((bins_per_octave - 1)
                                      / bins_per_octave)
        else:
            fmax_t = fmin_t * 2.0 ** ((remainder - 1) / bins_per_octave)
        fmin_t = fmax_t / 2.0 ** (1 - 1.0 / bins_per_octave)
        if fmax_t > sr / 2:
            raise ValueError("top CQT bin exceeds Nyquist; reduce n_bins")

        # early downsampling (reference get_early_downsample_params)
        self.early_factor = 1
        self.early_filter = None
        if earlydownsample:
            window_bandwidth = 1.5
            filter_cutoff = fmax_t * (1 + 0.5 * window_bandwidth / q)
            nyquist = sr // 2
            c1 = max(0, int(np.ceil(np.log2(0.85 * nyquist / filter_cutoff))
                            - 1) - 2)
            num_twos = int(np.ceil(np.log2(hop_length)))
            c2 = max(0, num_twos - self.n_octaves + 1)
            count = min(c1, c2)
            if count > 0:
                self.early_factor = 2 ** count
                hop_length //= self.early_factor
                sr = sr / float(self.early_factor)
                self.early_filter = jnp.asarray(_firwin2_lowpass(
                    1.0 / self.early_factor, 256, 0.03)[None, None, :])
        self.hop_length = hop_length

        kernels, self.n_fft, _ = fb.cqt_kernels(
            q, sr, fmin_t, n_filters, bins_per_octave, basis_norm, window)
        spec = np.fft.fft(kernels, axis=1)[:, :self.n_fft // 2 + 1]
        self.kernel_spec = jnp.asarray(np.conj(spec).T.astype(np.complex64))

        freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
        self.sqrt_lengths = jnp.asarray(
            np.sqrt(np.ceil(q * sr / freqs)).astype(np.float32))

        # x2 decimation lowpass (reference uses transitionBandwidth=0.001)
        self.lowpass = jnp.asarray(
            _firwin2_lowpass(0.5, 256, 0.001)[None, None, :])

    def _downsample(self, x, taps, stride):
        pad = (taps.shape[-1] - 1) // 2
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
        return jax.lax.conv_general_dilated(
            xp, taps, window_strides=(stride,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"))

    def _octave(self, x, hop):
        """Frequency-domain top-octave CQT of (B, L) at the given hop."""
        pad = self.n_fft // 2
        if self.pad_mode == "reflect":
            x = reflect_pad(x, pad)
        else:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        frames = _frame(x, self.n_fft, hop)
        X = jnp.fft.rfft(frames, axis=-1)
        return jnp.matmul(X, self.kernel_spec)     # (B, T, n_filters)

    def __call__(self, x, output_format="Magnitude"):
        """(B, L) -> (B, T, n_bins)."""
        if self.early_filter is not None:
            x = self._downsample(x[:, None, :], self.early_filter,
                                 self.early_factor)[:, 0]
        hop = self.hop_length
        octaves = [self._octave(x, hop)]           # top octave first
        sig = x[:, None, :]
        for _ in range(self.n_octaves - 1):
            assert hop % 2 == 0, \
                "hop_length must be divisible by 2**n_octaves"
            hop //= 2
            sig = self._downsample(sig, self.lowpass, 2)
            octaves.append(self._octave(sig[:, 0], hop))

        t_min = min(o.shape[1] for o in octaves)
        # low -> high frequency; drop excess bottom bins
        full = jnp.concatenate([o[:, :t_min] for o in octaves[::-1]],
                               axis=2)
        full = full[:, :, full.shape[2] - self.n_bins:]
        if self.norm:
            full = full / self.n_fft * self.sqrt_lengths
        else:
            full = full * self.sqrt_lengths
        full = full * self.early_factor
        if output_format == "Magnitude":
            return jnp.abs(full)
        if output_format == "Complex":
            return jnp.stack([jnp.real(full), jnp.imag(full)], axis=-1)
        raise ValueError(output_format)


class CQT2010v2:
    """Multi-octave CQT: top-octave kernels reused across octaves with
    successive x2 decimation (reference `CQT2010v2`,
    `model/Spectrogram.py:1362-1642`)."""

    def __init__(self, sr=22050, hop_length=512, fmin=32.70, fmax=None,
                 n_bins=84, bins_per_octave=12, norm=1, window="hann",
                 center=True, pad_mode="reflect",
                 precision=jax.lax.Precision.HIGHEST):
        import scipy.signal

        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.precision = precision
        self.n_bins = n_bins
        self.bins_per_octave = bins_per_octave

        q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
        self.n_octaves = int(np.ceil(n_bins / bins_per_octave))
        # top-octave kernels at the original sample rate
        remainder = n_bins % bins_per_octave
        top_bins = remainder if remainder else bins_per_octave
        fmax_t = fmin * 2.0 ** ((n_bins - 1) / bins_per_octave)
        fmin_top = fmax_t / 2.0 ** ((bins_per_octave - 1)
                                    / bins_per_octave)
        kernels, self.kernel_width, lengths = fb.cqt_kernels(
            q, sr, fmin_top, bins_per_octave, bins_per_octave, norm,
            window)
        self.kr = jnp.asarray(kernels.real[:, None, :])
        self.ki = jnp.asarray(kernels.imag[:, None, :])
        self.sqrt_lengths = jnp.asarray(np.sqrt(lengths))[None, :, None]
        self.top_bins = top_bins

        # 256-tap halfband lowpass for the x2 decimation cascade
        taps = scipy.signal.firwin(256, 0.4985, window=("kaiser", 9.0))
        self.lowpass = jnp.asarray(taps.astype(np.float32)[None, None, :])

    def _conv(self, x, kern, stride):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(stride,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            precision=self.precision)

    def _downsample2(self, x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (127, 128)), mode="edge")
        return self._conv(xp, self.lowpass, 2)

    def __call__(self, x):
        """(B, L) -> (B, T, n_bins) CQT magnitude."""
        if self.center:
            pad = self.kernel_width // 2
            if self.pad_mode == "reflect":
                x = reflect_pad(x, pad)
            else:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        x = x[:, None, :]

        octaves = []
        sig = x
        hop = self.hop_length
        for oct_idx in range(self.n_octaves):
            if oct_idx > 0:
                sig = self._downsample2(sig)
                assert hop % 2 == 0, \
                    "hop_length must be a multiple of 2**n_octaves"
                hop //= 2
            real = self._conv(sig, self.kr, hop) * self.sqrt_lengths
            imag = -self._conv(sig, self.ki, hop) * self.sqrt_lengths
            mag = jnp.sqrt(real * real + imag * imag)
            octaves.append(mag)

        # octave o covers bins [n_bins - (o+1)*bpo, n_bins - o*bpo); the
        # bottom (n_octaves*bpo - n_bins) bins are excess — drop them.
        t_min = min(m.shape[-1] for m in octaves)
        stacked = [m[:, :, :t_min] for m in octaves]
        full = jnp.concatenate(stacked[::-1], axis=1)   # low -> high
        full = full[:, full.shape[1] - self.n_bins:]
        return jnp.swapaxes(full, 1, 2)
