"""tools/preprocess_audio.py — the Preprocessing.ipynb counterpart.

Covers the notebook's three jobs (reference `Preprocessing.ipynb`): batch
midi->tsv is `python -m reconvat_tpu.data.midi_io` (tested in
test_decode_midi.py); here: the 16 kHz mono resample and the dummy-tsv
staging for unlabeled VAT corpora.
"""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_preprocess_resample_and_dummy_tsv(tmp_path):
    from scipy.io import wavfile

    sr = 44100
    t = np.arange(sr * 2) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    src = tmp_path / "clip.wav"
    wavfile.write(str(src), sr, pcm)

    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "preprocess_audio.py"),
         "--out-dir", str(out_dir), "--dummy-tsv", str(src)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]

    from reconvat_tpu.data.audio_io import read_audio

    out_pcm, out_sr = read_audio(str(out_dir / "clip.wav"))
    assert out_sr == 16000
    assert abs(len(out_pcm) - 32000) < 4
    # the 440 Hz tone must survive the polyphase resample
    spec = np.abs(np.fft.rfft(out_pcm[:16000].astype(np.float64)))
    assert abs(np.argmax(spec) - 440) <= 1

    # dummy tsv parses exactly like the datasets parse real tsvs
    tsv = np.loadtxt(str(out_dir / "clip.tsv"), delimiter="\t", skiprows=1)
    assert tsv.shape == (5, 4)
    assert (tsv == 60).all()
