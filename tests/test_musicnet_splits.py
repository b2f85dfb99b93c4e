"""MusicNet family-group split logic (reference `model/dataset.py:216-342`)."""
import os

import pytest

from reconvat_tpu.data.datasets import MusicNet

from . import synth_data


@pytest.fixture(scope="module")
def musicnet_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("musicnet"))
    os.makedirs(os.path.join(root, "train_data"))
    os.makedirs(os.path.join(root, "test_data"))
    os.makedirs(os.path.join(root, "tsv_train_labels"))
    os.makedirs(os.path.join(root, "tsv_test_labels"))

    # ensembles chosen so string/violin groups split deterministically
    meta = [
        (1001, "Solo Violin"), (1002, "Solo Violin"),
        (1101, "String Quartet"), (1102, "String Quartet"),
        (1201, "Accompanied Cello"),
        (1301, "Wind Quintet"), (1302, "Wind Quintet"),
        (2203, "Solo Flute"),
    ]
    with open(os.path.join(root, "train_metadata.csv"), "w") as f:
        f.write("id,ensemble\n")
        for i, ens in meta:
            f.write(f"{i},{ens}\n")
    with open(os.path.join(root, "test_metadata.csv"), "w") as f:
        f.write("id,ensemble\n2106,Solo Violin\n1819,Wind Quintet\n")

    from reconvat_tpu.data.labels import save_tsv

    for i, _ in meta:
        rows = synth_data.synth_notes(2.0, seed=i, n_notes=4)
        audio = synth_data.render_audio(rows, 2.0)
        from reconvat_tpu.data.audio_io import write_wav

        write_wav(os.path.join(root, "train_data", f"{i}.wav"), audio, 16000)
        # datasets glob .flac then .wav; provide flac via the test encoder
        from . import flac_encoder

        with open(os.path.join(root, "train_data", f"{i}.flac"), "wb") as g:
            g.write(flac_encoder.encode_flac(audio, 16000))
        save_tsv(os.path.join(root, "tsv_train_labels", f"{i}.tsv"), rows)
    for i in (2106, 1819):
        rows = synth_data.synth_notes(2.0, seed=i, n_notes=4)
        audio = synth_data.render_audio(rows, 2.0)
        from . import flac_encoder

        with open(os.path.join(root, "test_data", f"{i}.flac"), "wb") as g:
            g.write(flac_encoder.encode_flac(audio, 16000))
        save_tsv(os.path.join(root, "tsv_test_labels", f"{i}.tsv"), rows)
    return root


def _ids(ds):
    return sorted(int(os.path.splitext(os.path.basename(d["path"]))[0])
                  for d in ds.data)


def test_string_labeled_takes_first_per_ensemble(musicnet_root):
    if os.environ.get("RECONVAT_NO_NATIVE"):
        pytest.skip("needs native flac decoder")
    ds = MusicNet(musicnet_root, groups=["train_string_l"], verbose=False)
    # first id per matching string ensemble: Solo Violin->1001,
    # String Quartet->1101, Accompanied Cello->1201
    assert _ids(ds) == [1001, 1101, 1201]


def test_string_unlabeled_takes_rest(musicnet_root):
    ds = MusicNet(musicnet_root, groups=["train_string_ul"], verbose=False)
    assert _ids(ds) == [1002, 1102]


def test_violin_groups(musicnet_root):
    l = MusicNet(musicnet_root, groups=["train_violin_l"], verbose=False)
    assert _ids(l) == [1001, 1002]     # Solo + Accompanied Violin
    ul = MusicNet(musicnet_root, groups=["train_violin_ul"], verbose=False)
    assert _ids(ul) == [1101, 1102]    # Quartet + Sextet


def test_wind_groups(musicnet_root):
    l = MusicNet(musicnet_root, groups=["train_wind_l"], verbose=False)
    assert _ids(l) == [1301]
    ul = MusicNet(musicnet_root, groups=["train_wind_ul"], verbose=False)
    assert _ids(ul) == [1302]


def test_flute_labeled(musicnet_root):
    ds = MusicNet(musicnet_root, groups=["train_flute_l"], verbose=False)
    assert _ids(ds) == [2203]
