"""Guqin / Corelli / ApplicationWind file-listing + torch_convert units."""
import os

import numpy as np
import pytest

from reconvat_tpu.data.audio_io import write_wav
from reconvat_tpu.data.datasets import (ApplicationDataset, ApplicationWind,
                                        Corelli, Guqin)
from reconvat_tpu.data.labels import save_tsv

from . import flac_encoder, synth_data


def _write_clip(path, seed=0, duration=2.0):
    rows = synth_data.synth_notes(duration, seed=seed, n_notes=4)
    audio = synth_data.render_audio(rows, duration)
    if path.endswith(".flac"):
        with open(path, "wb") as f:
            f.write(flac_encoder.encode_flac(audio, 16000))
    else:
        write_wav(path, audio, 16000)
    return rows


def test_guqin_groups(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "audio"))
    os.makedirs(os.path.join(root, "tsv_label"))
    for i, song in enumerate(["jiou", "siang", "gu", "guan", "liang"]):
        rows = _write_clip(os.path.join(root, "audio", song + ".flac"),
                           seed=i)
        save_tsv(os.path.join(root, "tsv_label", song + ".tsv"), rows)

    train = Guqin(root, groups=["train_l"], verbose=False)
    # only the training songs present in the fixture load
    assert sorted(os.path.basename(d["path"]) for d in train.data) == \
        ["jiou.flac", "siang.flac"]
    test = Guqin(root, groups=["test"], verbose=False)
    assert len(test) == 3
    with pytest.raises(Exception):
        Guqin(root, groups=["bogus"], verbose=False)


def test_corelli_groups(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "op6_no1"))
    for i in range(2):
        rows = _write_clip(os.path.join(root, "op6_no1",
                                        f"mov{i}.flac"), seed=i)
        save_tsv(os.path.join(root, "op6_no1", f"mov{i}.tsv"), rows)
    ds = Corelli(root, groups=["op6_no1"], verbose=False)
    assert len(ds) == 2


def test_application_wind(tmp_path):
    root = str(tmp_path)
    for i in range(2):
        rows = _write_clip(os.path.join(root, f"take{i}.flac"), seed=i)
        save_tsv(os.path.join(root, f"take{i}.tsv"), rows)
    ds = ApplicationWind(root, verbose=False)
    assert len(ds) == 2


def test_application_dataset_mixed_formats(tmp_path):
    root = str(tmp_path)
    _write_clip(os.path.join(root, "a.flac"), seed=0)
    _write_clip(os.path.join(root, "b.wav"), seed=1)
    ds = ApplicationDataset(root)
    assert len(ds) == 2
    item = ds[0]
    assert item["audio"].dtype == np.float32
    assert abs(item["audio"]).max() <= 1.0


def test_torch_convert_layouts():
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from reconvat_tpu.nn.unet import TorchConvTranspose
    from reconvat_tpu.train.torch_convert import torch_to_flax

    # Conv2d OIHW -> HWIO
    tconv = torch.nn.Conv2d(3, 5, (3, 3), padding=1)
    fconv = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)])
    x = np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32)
    v = fconv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    conv, rep = torch_to_flax(
        {"weight": tconv.weight, "bias": tconv.bias}, v)
    assert not rep["skipped"]
    got = fconv.apply(conv, jnp.asarray(x))
    with torch.no_grad():
        expect = tconv(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               expect, rtol=1e-4, atol=1e-5)

    # ConvTranspose2d IOHW -> our HWOI param
    tct = torch.nn.ConvTranspose2d(3, 4, (2, 2), stride=2)
    fct = TorchConvTranspose(4, (2, 2), (2, 2), (0, 0))
    v = fct.init(jax.random.PRNGKey(0), jnp.asarray(x))
    conv, rep = torch_to_flax({"weight": tct.weight, "bias": tct.bias}, v)
    assert not rep["skipped"]
    got = fct.apply(conv, jnp.asarray(x))
    with torch.no_grad():
        expect = tct(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               expect, rtol=1e-4, atol=1e-5)
