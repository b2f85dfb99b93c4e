"""Native FLAC decoder round-trip tests against the test-only encoder."""

import numpy as np
import pytest

from reconvat_tpu.data import audio_io

from . import flac_encoder


def _require_native():
    if audio_io._native_lib() is None:
        pytest.skip("native library not built (make -C native)")


def _roundtrip(tmp_path, samples, sr=16000, **kw):
    data = flac_encoder.encode_flac(samples, sr, **kw)
    path = str(tmp_path / "t.flac")
    with open(path, "wb") as f:
        f.write(data)
    pcm, got_sr = audio_io.read_flac(path)
    assert got_sr == sr
    return pcm


@pytest.mark.parametrize("subframe_mode", ["verbatim", "fixed0", "fixed1",
                                           "fixed2", "fixed3", "fixed4",
                                           "auto"])
def test_mono_roundtrip(tmp_path, subframe_mode):
    _require_native()
    rng = np.random.RandomState(0)
    n = 10000
    t = np.arange(n)
    x = (3000 * np.sin(2 * np.pi * 440 * t / 16000)
         + rng.randn(n) * 100).astype(np.int16)
    pcm = _roundtrip(tmp_path, x, subframe_mode=subframe_mode)
    np.testing.assert_array_equal(pcm, x)


def test_constant_subframe(tmp_path):
    _require_native()
    x = np.full(5000, -123, dtype=np.int16)
    pcm = _roundtrip(tmp_path, x, subframe_mode="constant")
    np.testing.assert_array_equal(pcm, x)


@pytest.mark.parametrize("stereo_mode", ["independent", "left_side",
                                         "right_side", "mid_side"])
def test_stereo_decorrelation_roundtrip(tmp_path, stereo_mode):
    _require_native()
    rng = np.random.RandomState(1)
    n = 8192
    left = (rng.randn(n) * 5000).astype(np.int16)
    right = (left * 0.8 + rng.randn(n) * 500).astype(np.int16)
    x = np.stack([left, right], axis=1)
    pcm = _roundtrip(tmp_path, x, stereo_mode=stereo_mode,
                     subframe_mode="verbatim")
    # read_flac downmixes stereo to mono (mean), matching our loader policy
    expect = x.reshape(-1, 2).mean(axis=1).astype(np.int16)
    np.testing.assert_array_equal(pcm, expect)


def test_multiblock_and_odd_length(tmp_path):
    _require_native()
    rng = np.random.RandomState(2)
    x = (rng.randn(4096 * 3 + 777) * 8000).astype(np.int16)
    pcm = _roundtrip(tmp_path, x, subframe_mode="fixed2")
    np.testing.assert_array_equal(pcm, x)


def test_read_audio_dispatch(tmp_path):
    _require_native()
    x = (np.random.RandomState(3).randn(3000) * 1000).astype(np.int16)
    with open(tmp_path / "a.flac", "wb") as f:
        f.write(flac_encoder.encode_flac(x, 16000))
    pcm, sr = audio_io.read_audio(str(tmp_path / "a.flac"))
    np.testing.assert_array_equal(pcm, x)

    audio_io.write_wav(str(tmp_path / "a.wav"), x, 16000)
    pcm2, sr2 = audio_io.read_audio(str(tmp_path / "a.wav"))
    np.testing.assert_array_equal(pcm2, x)


def test_corrupt_file_fails_cleanly(tmp_path):
    _require_native()
    with open(tmp_path / "bad.flac", "wb") as f:
        f.write(b"fLaCgarbagegarbage")
    with pytest.raises(ValueError):
        audio_io.read_flac(str(tmp_path / "bad.flac"))
