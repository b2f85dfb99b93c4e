"""Import helpers exposing the read-only reference implementation
(`/root/reference`, PyTorch) as a *test oracle*.

The reference depends on the `nnAudio` pip package, which is not installed;
its kernel-builder functions are re-exposed here from our own numpy
implementations (reconvat_tpu.ops.filterbanks). Parity tests therefore
validate our *device pipeline* (padding / conv / magnitude / matmul and the
model graphs) against the reference's torch pipeline with identical kernels.

Skip-safe: everything degrades to pytest.skip when the reference checkout or
torch is unavailable.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def _install_nnaudio_stub():
    if "nnAudio" in sys.modules:
        return
    import torch

    from reconvat_tpu.ops import filterbanks as fb

    def create_fourier_kernels(n_fft, win_length=None, freq_bins=None,
                               fmin=50, fmax=6000, sr=44100,
                               freq_scale='linear', window='hann',
                               verbose=True):
        assert freq_scale == 'no', "oracle stub supports freq_scale='no' only"
        if win_length is None:
            win_length = n_fft
        if freq_bins is None:
            freq_bins = n_fft // 2 + 1
        n = np.arange(n_fft)
        k = np.arange(freq_bins)
        arg = 2 * np.pi * np.outer(k, n) / n_fft
        wsin = np.sin(arg)[:, None, :].astype(np.float32)
        wcos = np.cos(arg)[:, None, :].astype(np.float32)
        bins2freq = (k * sr / n_fft).tolist()
        window_mask = fb.pad_center(
            fb.get_window(window, win_length), n_fft).astype(np.float32)
        # nnAudio returns kernels of shape (bins, 1, n_fft) and a window mask
        # that the STFT class multiplies in afterwards.
        return wsin, wcos, bins2freq, list(k), window_mask[None, None, :]

    def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm=1):
        return fb.mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm)

    def create_cqt_kernels(Q, fs, fmin, n_bins=84, bins_per_octave=12,
                           norm=1, window='hann', fmax=None,
                           topbin_check=True):
        kernels, fft_len, lengths = fb.cqt_kernels(
            Q, fs, fmin, n_bins, bins_per_octave, norm, window, fmax)
        return kernels, fft_len, torch.tensor(lengths).float()

    def broadcast_dim(x):
        if x.dim() == 1:
            x = x[None, None, :]
        elif x.dim() == 2:
            x = x[:, None, :]
        elif x.dim() != 3:
            raise ValueError("Only 1D/2D/3D audio supported")
        return x

    utils = types.ModuleType("nnAudio.utils")
    utils.create_fourier_kernels = create_fourier_kernels
    utils.create_cqt_kernels = create_cqt_kernels
    utils.broadcast_dim = broadcast_dim
    librosa_functions = types.ModuleType("nnAudio.librosa_functions")
    librosa_functions.mel = mel

    nnaudio = types.ModuleType("nnAudio")
    nnaudio.utils = utils
    nnaudio.librosa_functions = librosa_functions
    sys.modules["nnAudio"] = nnaudio
    sys.modules["nnAudio.utils"] = utils
    sys.modules["nnAudio.librosa_functions"] = librosa_functions

    # The reference model files do `from nnAudio import Spectrogram`.
    spectrogram_mod = _load_reference_module("model.Spectrogram",
                                             "model/Spectrogram.py")
    nnaudio.Spectrogram = spectrogram_mod
    sys.modules["nnAudio.Spectrogram"] = spectrogram_mod


_loaded = {}


def _load_reference_module(qualname, relpath):
    import importlib.util
    import os

    if qualname in _loaded:
        return _loaded[qualname]
    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference file missing: {path}")
    spec = importlib.util.spec_from_file_location(qualname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[qualname] = mod
    spec.loader.exec_module(mod)
    _loaded[qualname] = mod
    return mod


def reference_spectrogram():
    """The vendored nnAudio Spectrogram module from the reference."""
    pytest.importorskip("torch")
    _install_nnaudio_stub()
    return sys.modules["nnAudio.Spectrogram"]


def reference_module(name):
    """Load reference `model/<name>.py` with stubbed deps. e.g. 'decoding'."""
    pytest.importorskip("torch")
    _install_nnaudio_stub()
    # model/utils.py and friends import from the `model` package namespace;
    # register a lightweight package alias first.
    if "model" not in sys.modules:
        pkg = types.ModuleType("model")
        pkg.__path__ = [f"{REFERENCE_ROOT}/model"]
        sys.modules["model"] = pkg
    return _load_reference_module(f"model.{name}", f"model/{name}.py")
