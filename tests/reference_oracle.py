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


def torchvision_resnet18():
    """Plain-torch transliteration of torchvision v0.9.0 resnet18.

    The reference downloads it via `torch.hub.load`
    (`model/Unet_prestack.py:117`) — unavailable here (no torchvision, no
    network), so the BasicBlock graph is written out; state_dict names
    (`layerL.J.convN` / `downsample.0/1`) match torchvision exactly.
    """
    import torch
    import torch.nn as tnn

    class TorchBasicBlock(tnn.Module):
        def __init__(self, inp, out, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(out)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(out)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class TorchResNet18(tnn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)

            def stage(inp, out, stride):
                ds = None
                if stride != 1 or inp != out:
                    ds = tnn.Sequential(
                        tnn.Conv2d(inp, out, 1, stride, bias=False),
                        tnn.BatchNorm2d(out))
                return tnn.Sequential(TorchBasicBlock(inp, out, stride, ds),
                                      TorchBasicBlock(out, out))

            self.layer1 = stage(64, 64, 1)
            self.layer2 = stage(64, 128, 2)
            self.layer3 = stage(128, 256, 2)
            self.layer4 = stage(256, 512, 2)
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x)
            return self.fc(torch.flatten(x, 1))

    return TorchResNet18()


def reference_prestack_model():
    """A runnable reference `Prestack_Model` (`model/Unet_prestack.py:113`).

    Two environment shims, neither changing the defined computation:
    - `torch.hub.load` is replaced by `torchvision_resnet18()` (no network).
    - The reference patches `resnet.conv1 = nn.Conv1d(1, 64, (7,7), (2,2),
      (3,3))` — a Conv1d module holding a 4-D (64,1,7,7) weight. Modern
      torch refuses 4-D input to conv1d (reference bug: only ran on old
      torch dispatch), so the module is swapped for a Conv2d carrying the
      *same weight tensor* — the computation that weight shape defines,
      and what our flax model implements.
    """
    import torch

    up = reference_module("Unet_prestack")
    orig_hub_load = torch.hub.load
    torch.hub.load = lambda *a, **kw: torchvision_resnet18()
    try:
        model = up.Prestack_Model("resnet18")
    finally:
        torch.hub.load = orig_hub_load
    resnet = model.prestack_model[1]
    conv1 = torch.nn.Conv2d(1, 64, (7, 7), (2, 2), (3, 3), bias=False)
    with torch.no_grad():
        conv1.weight.copy_(resnet.conv1.weight)
    resnet.conv1 = conv1
    return model
