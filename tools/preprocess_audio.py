"""Resample audio corpora to the 16 kHz mono wav the pipeline expects.

Counterpart of the reference's `Preprocessing.ipynb` (pydub/ffmpeg resample
to 16k, `README.md:23-31`). Uses our native FLAC decoder / scipy wav IO and
polyphase resampling — no ffmpeg needed.

    python tools/preprocess_audio.py --out-dir data16k src/*.flac src/*.wav

`--dummy-tsv` additionally writes the notebook's placeholder label file
(five (60, 60, 60, 60) rows, `Preprocessing.ipynb` last cell) next to each
output, which is how unlabeled corpora are staged for the semi-supervised
VAT loaders (the labels are never read as supervision for `_ul` splits).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from reconvat_tpu import constants as C                      # noqa: E402
from reconvat_tpu.data.audio_io import read_audio, write_wav  # noqa: E402


def resample_to_16k(pcm, sr):
    import numpy as np
    from scipy.signal import resample_poly

    if sr == C.SAMPLE_RATE:
        return pcm
    from math import gcd

    g = gcd(C.SAMPLE_RATE, sr)
    out = resample_poly(pcm.astype(np.float64), C.SAMPLE_RATE // g, sr // g)
    return np.clip(out, -32768, 32767).astype(np.int16)


def write_dummy_tsv(path: str):
    """Placeholder labels for unlabeled VAT data (notebook last cell):
    five identical (onset=60, offset=60, note=60, velocity=60) rows."""
    import numpy as np

    notes = np.full((5, 4), 60.0)
    np.savetxt(path, notes, "%.6f", "\t",
               header="onset\toffset\tnote\tvelocity")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--dummy-tsv", action="store_true",
                    help="also write a placeholder .tsv per file "
                         "(unlabeled-VAT staging, Preprocessing.ipynb)")
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.inputs:
        pcm, sr = read_audio(path)
        pcm = resample_to_16k(pcm, sr)
        base = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.out_dir, base + ".wav")
        write_wav(out, pcm, C.SAMPLE_RATE)
        if args.dummy_tsv:
            write_dummy_tsv(os.path.join(args.out_dir, base + ".tsv"))
        print(f"{path} ({sr} Hz) -> {out} (16000 Hz, "
              f"{len(pcm) / 16000:.1f} s)")


if __name__ == "__main__":
    main()
