"""DSP frontend parity and property tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from reconvat_tpu import constants as C
from reconvat_tpu.ops import filterbanks as fb
from reconvat_tpu.ops import normalize as norm_ops
from reconvat_tpu.ops import spectrogram as spec_ops

from . import reference_oracle


def _audio(batch=2, n=32000, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randint(-2 ** 15, 2 ** 15, size=(batch, n)) / 32768.0
            ).astype(np.float32)


# ---------------------------------------------------------------------------
# Independent math checks (numpy rfft path, no reference involved)
# ---------------------------------------------------------------------------

def test_stft_power_matches_numpy_rfft():
    x = _audio(batch=1, n=8192)
    stft = spec_ops.STFT(n_fft=2048, hop_length=512)
    got = np.asarray(stft.power(jnp.asarray(x)))[0]

    w = fb.hann_window(2048)
    xp = np.pad(x[0], (1024, 1024), mode="reflect")
    n_frames = (len(xp) - 2048) // 512 + 1
    for t in [0, 1, n_frames - 1]:
        frame = xp[t * 512:t * 512 + 2048] * w
        expect = np.abs(np.fft.rfft(frame)) ** 2
        np.testing.assert_allclose(got[t], expect, rtol=1e-4, atol=1e-3)
    assert got.shape == (n_frames, 1025)


def test_frame_count_640():
    # 327680-sample crops minus the last sample give exactly 640 frames
    # (reference convention `model/self_attention_VAT.py:1112`).
    x = jnp.zeros((1, 327680 - 1))
    mel = spec_ops.make_frontend("Mel")[0]
    assert mel(x).shape == (1, 640, 229)


def test_mel_filterbank_properties():
    m = fb.mel_filterbank(C.SAMPLE_RATE, 2048, 229, C.MEL_FMIN, C.MEL_FMAX)
    assert m.shape == (229, 1025)
    assert np.all(m >= 0)
    # every filter has support, and supports move monotonically upward
    peaks = m.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert m.sum() > 0
    # slaney normalization: each filter integrates to ~2/(width in Hz)
    freqs = fb.mel_frequencies(229 + 2, C.MEL_FMIN, C.MEL_FMAX)
    df = C.SAMPLE_RATE / 2 / 1024
    areas = m.sum(axis=1) * df
    widths = freqs[2:] - freqs[:-2]
    good = widths > 4 * df  # only filters wide enough to be resolved
    np.testing.assert_allclose(areas[good], 2 * (freqs[1:-1] - freqs[:-2])[good]
                               / widths[good], rtol=0.1)


def test_hann_window_matches_scipy():
    scipy_signal = pytest.importorskip("scipy.signal")
    np.testing.assert_allclose(fb.hann_window(2048),
                               scipy_signal.get_window("hann", 2048),
                               atol=1e-12)


# ---------------------------------------------------------------------------
# Reference (torch conv pipeline) parity
# ---------------------------------------------------------------------------

def test_mel_matches_reference_pipeline():
    torch = pytest.importorskip("torch")
    Spectrogram = reference_oracle.reference_spectrogram()
    ref = Spectrogram.MelSpectrogram(
        sr=C.SAMPLE_RATE, win_length=C.WINDOW_LENGTH, n_mels=C.N_BINS,
        hop_length=C.HOP_LENGTH, fmin=C.MEL_FMIN, fmax=C.MEL_FMAX,
        trainable_mel=False, trainable_STFT=False, verbose=False)
    x = _audio(batch=2, n=64000)
    with torch.no_grad():
        expect = ref(torch.tensor(x)).numpy()  # (B, bins, T)

    mel = spec_ops.make_frontend("Mel")[0]
    got = np.asarray(mel(jnp.asarray(x)))     # (B, T, bins)
    got = np.swapaxes(got, 1, 2)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)
    # log-domain agreement (what the models actually consume)
    np.testing.assert_allclose(np.log(got + 1e-5), np.log(expect + 1e-5),
                               atol=2e-3)


def test_cqt_matches_reference_pipeline():
    torch = pytest.importorskip("torch")
    Spectrogram = reference_oracle.reference_spectrogram()
    ref = Spectrogram.CQT1992v2(sr=C.SAMPLE_RATE, hop_length=C.HOP_LENGTH,
                                n_bins=176, fmin=27.5, bins_per_octave=24,
                                trainable=False, verbose=False)
    x = _audio(batch=1, n=65536)
    with torch.no_grad():
        expect = ref(torch.tensor(x)).numpy()  # (B, bins, T)

    cqt = spec_ops.make_frontend("CQT")[0]
    got = np.swapaxes(np.asarray(cqt(jnp.asarray(x))), 1, 2)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_normalization_matches_reference():
    torch = pytest.importorskip("torch")
    utils = reference_oracle.reference_module("utils")
    x = np.abs(_audio(batch=3, n=229 * 64)).reshape(3, 229, 64) * 5.0
    for mode in ["framewise", "imagewise"]:
        ref = utils.Normalization(mode)
        expect = ref.transform(torch.tensor(x)).numpy()
        # ours runs on time-major (B, T, F); reference on (B, F, T).
        if mode == "framewise":
            got = norm_ops.Normalization(mode)(
                jnp.asarray(np.swapaxes(x, 1, 2)))
            got = np.swapaxes(np.asarray(got), 1, 2)
        else:
            got = np.asarray(norm_ops.Normalization(mode)(jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_cqt_matmul_path_equals_conv_path():
    """The chunked-matmul CQT (hop | kernel_width) must equal the direct
    conv evaluation."""
    cqt = spec_ops.CQT1992v2(sr=C.SAMPLE_RATE, hop_length=C.HOP_LENGTH,
                             n_bins=176, fmin=27.5, bins_per_octave=24)
    assert cqt.kr_chunks is not None
    x = jnp.asarray(_audio(batch=1, n=65536))
    fast = np.asarray(cqt(x))
    cqt.kr_chunks = None  # force the conv fallback
    slow = np.asarray(cqt(x))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-4)
