"""Extra frontend classes: MFCC / Gammatonegram / DFT / iSTFT /
Griffin-Lim / CQT2010v2 / CFP."""
import numpy as np
import pytest

import jax.numpy as jnp

from reconvat_tpu.ops import extra_frontends as xf
from reconvat_tpu.ops import filterbanks as fb
from reconvat_tpu.ops.spectrogram import CQT1992v2, make_frontend


def _tone(freq=440.0, n=32000, sr=16000, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None]


def test_mfcc_shape_and_dc():
    mfcc = xf.MFCC(sr=16000, n_mfcc=20, n_mels=64, hop_length=512)
    out = mfcc(jnp.asarray(_tone()))
    assert out.shape[0] == 1 and out.shape[2] == 20
    # scipy cross-check of the orthonormal DCT-II
    from scipy.fftpack import dct

    x = np.random.RandomState(0).rand(1, 4, 64).astype(np.float32)
    got = np.asarray(xf.MFCC(sr=16000, n_mfcc=64, n_mels=64)._dct(
        jnp.asarray(x)))
    expect = dct(x, type=2, norm="ortho", axis=-1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_gammatone_filterbank_properties():
    w = fb.gammatone_filterbank(16000, 2048, 64, 20.0, 8000.0)
    assert w.shape == (64, 1025)
    assert np.all(np.isfinite(w)) and np.all(w >= 0)
    cfs = fb.erb_centre_freqs(20.0, 8000.0, 64)
    freqs = np.linspace(0, 8000, 1025)
    # peaks land near the centre frequencies
    for i in [5, 20, 40, 60]:
        peak = freqs[w[i].argmax()]
        assert abs(peak - cfs[i]) / cfs[i] < 0.1, (peak, cfs[i])


def test_gammatonegram_runs():
    g = xf.Gammatonegram(sr=16000, n_fft=2048, n_bins=64, hop_length=512,
                         fmin=20.0, fmax=8000.0)
    out = g(jnp.asarray(_tone()))
    assert out.shape == (1, 63, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dft_istft_roundtrip():
    x = _tone(n=16384)
    dft = xf.DFT(n_fft=2048, hop_length=512)
    re, im = dft(jnp.asarray(x))
    rec = dft.inverse(re, im, length=x.shape[1])
    np.testing.assert_allclose(np.asarray(rec), x, atol=1e-3)


def test_istft_inverts_rfft_frames():
    from reconvat_tpu.ops.spectrogram import _frame, reflect_pad

    x = _tone(n=16384)
    n_fft, hop = 2048, 512
    win = fb.pad_center(fb.get_window("hann", n_fft), n_fft)
    frames = np.asarray(_frame(reflect_pad(jnp.asarray(x), 1024),
                               n_fft, hop)) * win
    spec = np.fft.rfft(frames, axis=-1)
    istft = xf.ISTFT(n_fft=n_fft, hop_length=hop)
    rec = istft(jnp.asarray(spec.real.astype(np.float32)),
                jnp.asarray(spec.imag.astype(np.float32)),
                length=x.shape[1])
    np.testing.assert_allclose(np.asarray(rec), x, atol=1e-3)


@pytest.mark.slow
def test_griffin_lim_reconstructs_tone():
    x = _tone(n=8192, freq=523.25)
    gl = xf.GriffinLim(n_fft=1024, hop_length=256, n_iter=32)
    mag = jnp.abs(gl._stft_complex(jnp.asarray(x)))
    rec = np.asarray(gl(mag, length=x.shape[1]))
    # phase retrieval: spectrum magnitude should match closely
    mag_rec = np.abs(np.asarray(gl._stft_complex(jnp.asarray(rec))))
    err = np.linalg.norm(mag_rec - np.asarray(mag)) / np.linalg.norm(mag)
    assert err < 0.15, err


@pytest.mark.slow
def test_cqt2010_close_to_cqt1992():
    """The multi-octave decimating CQT should approximate the direct CQT."""
    x = _tone(n=65536, freq=440.0)
    kw = dict(sr=16000, hop_length=512, n_bins=84, fmin=32.70,
              bins_per_octave=12)
    direct = np.asarray(CQT1992v2(**kw)(jnp.asarray(x)))
    multi = np.asarray(xf.CQT2010v2(**kw)(jnp.asarray(x)))
    T = min(direct.shape[1], multi.shape[1])
    d, m = direct[:, :T], multi[:, :T]
    # compare shape + peak bin + overall correlation
    assert m.shape[-1] == 84
    assert abs(int(d[0, T // 2].argmax()) - int(m[0, T // 2].argmax())) <= 1
    corr = np.corrcoef(d.ravel(), m.ravel())[0, 1]
    assert corr > 0.95, corr


def _cfp_numpy_oracle(x, fr, fs, hop, window_size, fc, tc, g, num_per_oct):
    """Float64 numpy transliteration of the reference
    `Combined_Frequency_Periodicity` (`model/Spectrogram.py:2093-2233`).

    The torch path is unrunnable on torch >= 1.8 (`torch.rfft` removed),
    so the reference math is written out literally: torch.stft semantics
    (center pad, constant mode, onesided=False, centered window pad),
    the rfft-real nonlinearity cascade, and the log-freq/log-quefrency
    triangular projection matrices."""
    import scipy.signal

    N = int(fs / float(fr))
    f = fs * np.linspace(0, 0.5, round(N // 2), endpoint=True)
    try:
        h = scipy.signal.windows.blackmanharris(window_size)
    except AttributeError:
        h = scipy.signal.blackmanharris(window_size)
    h = h.astype(np.float64)
    tc_idx = round(fs * tc)
    fc_idx = round(fc / fr)
    high_freq_idx = int(round((1 / tc) / fr) + 1)
    high_quef_idx = int(round(fs / fc) + 1)
    f = f[:high_freq_idx]
    q = np.arange(high_quef_idx) / float(fs)

    # torch.stft(center=True, pad_mode='constant', onesided=False)
    pad = N // 2
    xp = np.pad(np.asarray(x, np.float64), [(0, 0), (pad, pad)])
    hw = np.zeros(N)
    lpad = (N - window_size) // 2
    hw[lpad:lpad + window_size] = h
    T = 1 + (xp.shape[1] - N) // hop
    frames = np.stack([xp[:, k * hop:k * hop + N] for k in range(T)], axis=1)
    tfr0 = np.abs(np.fft.fft(frames * hw, axis=-1)) / np.linalg.norm(h)
    tfr0 = tfr0[:, 1:-1]  # reference drops first and last frames

    def nonlinear(X, gv, cutoff):
        cutoff = int(cutoff)
        if gv != 0:
            X = np.maximum(X, 0.0)
            X[:, :, :cutoff] = 0
            X[:, :, X.shape[2] - cutoff:] = 0
            return X ** gv
        X = np.log(X)
        X[:, :, :cutoff] = 0
        X[:, :, X.shape[2] - cutoff:] = 0
        return X

    spec = np.maximum(tfr0, 0.0) ** g[0]
    ceps = np.zeros_like(spec)
    for gc in range(1, len(g)):
        if gc % 2 == 1:
            ceps = np.real(np.fft.fft(spec, axis=-1)) / np.sqrt(N)
            ceps = nonlinear(ceps, g[gc], tc_idx)
        else:
            spec = np.real(np.fft.fft(ceps, axis=-1)) / np.sqrt(N)
            spec = nonlinear(spec, g[gc], fc_idx)

    half = int(round(N / 2))
    tfr = spec[:, :, :half][:, :, :high_freq_idx]
    cep = ceps[:, :, :half][:, :, :high_quef_idx]

    # create_logfreq_matrix (`model/Spectrogram.py:2193-2233`), literally
    start_freq, stop_freq = fc, 1 / tc
    nest = int(np.ceil(np.log2(stop_freq / start_freq)) * num_per_oct)
    central_freq = []
    for i in range(nest):
        cen = start_freq * 2.0 ** (float(i) / num_per_oct)
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
            for j in range(l, r):
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
        for j in range(int(round(fs / central_freq[i + 1])),
                       int(round(fs / central_freq[i - 1]) + 1)):
            if central_freq[i - 1] < finv[j] < central_freq[i]:
                quef_band[i, j] = ((finv[j] - central_freq[i - 1])
                                   / (central_freq[i] - central_freq[i - 1]))
            elif central_freq[i] < finv[j] < central_freq[i + 1]:
                quef_band[i, j] = ((central_freq[i + 1] - finv[j])
                                   / (central_freq[i + 1] - central_freq[i]))

    tfrLF = np.einsum("nf,btf->btn", freq_band, tfr)
    tfrLQ = np.einsum("nq,btq->btn", quef_band, cep)
    return tfrLF * tfrLQ


@pytest.mark.parametrize("config", ["reference_default", "production"])
def test_cfp_matches_numpy_oracle(config):
    """Value-level CFP parity against the float64 numpy transliteration
    of the reference math (supersedes the old shape-only test)."""
    rng = np.random.RandomState(0)
    if config == "production":
        # the make_frontend('CFP') config (reference UNet CFP wiring,
        # `model/self_attention_VAT.py:1031-1037`)
        frontend, n = make_frontend("CFP")
        kw = dict(fr=4, fs=16000, hop=512, window_size=2048, fc=30,
                  tc=1 / 8000, g=[0.24, 0.6, 1], num_per_oct=48)
        x = rng.randn(2, 8 * 512 - 1).astype(np.float32) * 0.1
    else:
        # the reference class defaults (`model/Spectrogram.py:2102-2104`)
        from reconvat_tpu.ops.spectrogram import CFP
        frontend = CFP()
        n = frontend.n_bins
        kw = dict(fr=2, fs=16000, hop=320, window_size=2049, fc=80,
                  tc=1 / 1000, g=[0.24, 0.6, 1], num_per_oct=48)
        x = rng.randn(1, 3200).astype(np.float32) * 0.1

    want = _cfp_numpy_oracle(x, **kw)
    got = np.asarray(frontend(jnp.asarray(x)))
    assert got.shape == want.shape == (x.shape[0], want.shape[1], n)
    assert np.all(np.isfinite(got))
    # fp32 FFT + power cascades vs float64 oracle
    np.testing.assert_allclose(got, want, rtol=2e-3,
                               atol=2e-4 * float(np.abs(want).max()))


def test_cqt1992_v1_matches_conv_formulation_oracle():
    """CQT1992 (v1) vs an independent numpy oracle that follows the
    reference formulation literally (`model/Spectrogram.py:896-919`):
    explicit sin/cos DFT matmuls at hop stride, `complex_mul` with the
    FFT'd CQT kernels, `(re, -im)` stacking, /kernel_width*sqrt(lengths)."""
    sr, hop, n_bins, fmin, bpo = 16000, 512, 48, 110.0, 12
    x = _tone(n=16384, freq=440.0)

    ours = xf.CQT1992(sr=sr, hop_length=hop, fmin=fmin, n_bins=n_bins,
                      bins_per_octave=bpo)
    got = np.asarray(ours(jnp.asarray(x)))

    q = 1.0 / (2.0 ** (1.0 / bpo) - 1.0)
    kernels, kw, lengths = fb.cqt_kernels(q, sr, fmin, n_bins, bpo, 1,
                                          "hann")
    spec = np.fft.fft(kernels, axis=1)[:, :kw // 2 + 1]
    kr, ki = spec.real, spec.imag

    pad = kw // 2
    xp = np.pad(x[0], pad, mode="reflect")
    n_frames = (len(xp) - kw) // hop + 1
    n = np.arange(kw)
    f = np.arange(kw // 2 + 1)
    wcos = np.cos(2 * np.pi * f[:, None] * n[None, :] / kw)
    wsin = np.sin(2 * np.pi * f[:, None] * n[None, :] / kw)
    mags = np.zeros((n_frames, n_bins), np.float64)
    for t in range(n_frames):
        frame = xp[t * hop:t * hop + kw]
        fourier_real = wcos @ frame
        fourier_imag = wsin @ frame
        cqt_real = kr @ fourier_real - ki @ fourier_imag
        cqt_imag = kr @ fourier_imag + ki @ fourier_real
        re = cqt_real / kw * np.sqrt(lengths)
        im = -cqt_imag / kw * np.sqrt(lengths)
        mags[t] = np.sqrt(re * re + im * im)

    assert got.shape == (1, n_frames, n_bins)
    np.testing.assert_allclose(got[0], mags, rtol=1e-3, atol=1e-6)


def test_cqt1992_v1_close_to_v2():
    """Half-spectrum frequency-domain CQT approximates the direct
    time-domain CQT (the kernels are near-analytic)."""
    kw = dict(sr=16000, hop_length=512, n_bins=84, fmin=32.70,
              bins_per_octave=12)
    x = _tone(n=65536, freq=440.0)
    v1 = np.asarray(xf.CQT1992(**kw)(jnp.asarray(x)))
    v2 = np.asarray(CQT1992v2(**kw)(jnp.asarray(x)))
    T = min(v1.shape[1], v2.shape[1])
    a, b = v1[:, :T], v2[:, :T]
    assert abs(int(a[0, T // 2].argmax()) - int(b[0, T // 2].argmax())) <= 1
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.99, corr


@pytest.mark.slow
def test_cqt2010_v1_close_to_direct():
    """Multi-octave frequency-domain CQT (published 2010 algorithm; the
    vendored reference forward is buggy — see class docstring)."""
    x = _tone(n=65536, freq=440.0)
    kw = dict(sr=16000, hop_length=512, n_bins=84, fmin=32.70,
              bins_per_octave=12)
    direct = np.asarray(CQT1992v2(**kw)(jnp.asarray(x)))
    multi = np.asarray(xf.CQT2010(**kw)(jnp.asarray(x)))
    assert multi.shape[-1] == 84
    T = min(direct.shape[1], multi.shape[1])
    d, m = direct[:, :T], multi[:, :T]
    assert abs(int(d[0, T // 2].argmax()) - int(m[0, T // 2].argmax())) <= 1
    corr = np.corrcoef(d.ravel(), m.ravel())[0, 1]
    assert corr > 0.95, corr
