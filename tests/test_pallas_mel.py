"""Fused Pallas mel-frontend kernel vs the XLA formulation (interpret
mode on CPU; compiles with Mosaic on TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from reconvat_tpu import constants as C
from reconvat_tpu.ops.pallas_mel import PallasMelSpectrogram
from reconvat_tpu.ops.spectrogram import MelSpectrogram

KW = dict(sr=C.SAMPLE_RATE, n_fft=2048, win_length=2048, n_mels=229,
          hop_length=512, fmin=C.MEL_FMIN, fmax=C.MEL_FMAX)


@pytest.mark.parametrize("n", [327679, 64 * 512 - 1, 10000])
def test_pallas_mel_matches_xla(n):
    x = jnp.asarray((np.random.RandomState(0).randn(2, n) * 0.1)
                    .astype(np.float32))
    a = np.asarray(MelSpectrogram(**KW)(x))
    b = np.asarray(PallasMelSpectrogram(**KW)(x))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7)


def test_pallas_mel_other_geometry():
    kw = dict(KW, n_mels=64, n_fft=1024, win_length=1024, hop_length=256)
    x = jnp.asarray((np.random.RandomState(1).randn(1, 40000) * 0.1)
                    .astype(np.float32))
    a = np.asarray(MelSpectrogram(**kw)(x))
    b = np.asarray(PallasMelSpectrogram(**kw)(x))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7)
