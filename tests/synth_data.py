"""Synthetic MAPS/MAESTRO-like corpora for integration tests (no real data
in this environment)."""
import json
import os
import pickle

import numpy as np

from reconvat_tpu import constants as C
from reconvat_tpu.data import midi_io
from reconvat_tpu.data.audio_io import write_wav
from reconvat_tpu.data.labels import save_tsv


def synth_notes(duration_s=8.0, seed=0, n_notes=12):
    rng = np.random.RandomState(seed)
    onsets = np.sort(rng.rand(n_notes) * (duration_s - 1.5))
    durs = 0.3 + rng.rand(n_notes) * 0.8
    notes = rng.randint(40, 90, n_notes)
    vels = rng.randint(40, 120, n_notes)
    return np.stack([onsets, onsets + durs, notes, vels], axis=1)


def render_audio(rows, duration_s=8.0, sr=C.SAMPLE_RATE):
    t = np.arange(int(duration_s * sr)) / sr
    x = np.zeros_like(t)
    for onset, offset, note, vel in rows:
        f0 = 440.0 * 2 ** ((note - 69) / 12.0)
        idx = (t >= onset) & (t < offset)
        tt = t[idx] - onset
        env = np.exp(-tt * 3.0) * (vel / 127.0)
        for h, amp in [(1, 1.0), (2, 0.5), (3, 0.25)]:
            if f0 * h < sr / 2:
                x[idx] += amp * env * np.sin(2 * np.pi * f0 * h * tt)
    x = x / max(np.abs(x).max(), 1e-9) * 0.7
    # small noise floor: real recordings never contain exact digital
    # silence, and the reference's imagewise min-max normalization
    # (model/utils.py:93-100) divides by zero on a fully-constant crop
    x = x + np.random.RandomState(len(rows)).randn(len(t)) * 1e-3
    return (x * 32767).astype(np.int16)


def make_maps_like(root, groups=("AkPnBcht",), files_per_group=1,
                   duration_s=8.0, seed=0):
    os.makedirs(os.path.join(root, "flac"), exist_ok=True)
    os.makedirs(os.path.join(root, "tsvs"), exist_ok=True)
    k = 0
    for group in groups:
        for i in range(files_per_group):
            rows = synth_notes(duration_s, seed=seed + k)
            name = f"synth{i:02d}_{group}"
            write_wav(os.path.join(root, "flac", name + ".wav"),
                      render_audio(rows, duration_s), C.SAMPLE_RATE)
            save_tsv(os.path.join(root, "tsvs", name + ".tsv"), rows)
            k += 1
    with open(os.path.join(root, "overlapping.pkl"), "wb") as f:
        pickle.dump(["__none__"], f)
    return root


def make_maestro_like(root, n_files=1, duration_s=8.0, seed=100):
    year = "2004"
    os.makedirs(os.path.join(root, year), exist_ok=True)
    meta = []
    for i in range(n_files):
        rows = synth_notes(duration_s, seed=seed + i)
        wav = os.path.join(year, f"m{i:02d}.wav")
        midi = os.path.join(year, f"m{i:02d}.midi")
        write_wav(os.path.join(root, wav), render_audio(rows, duration_s),
                  C.SAMPLE_RATE)
        # intervals in seconds, pitches in Hz, velocities in [0,1]
        pitches = midi_io.midi_to_hz(rows[:, 2])
        midi_io.save_midi(os.path.join(root, midi), pitches,
                          rows[:, :2], rows[:, 3] / 127.0)
        meta.append({"split": "train", "audio_filename": wav,
                     "midi_filename": midi})
    with open(os.path.join(root, "maestro-v2.0.0.json"), "w") as f:
        json.dump(meta, f)
    return root
