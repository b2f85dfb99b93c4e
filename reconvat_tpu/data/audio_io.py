"""Audio decode (host side).

The reference uses libsndfile via the SoundFile wheel
(`model/dataset.py:110`). Neither is available here; WAV decodes through
scipy, FLAC through our native C++ decoder (`native/` — built as a shared
library, loaded via ctypes). Everything returns int16 numpy + sample rate,
matching `soundfile.read(path, dtype='int16')`.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (os.path.join(here, "..", "native",
                              "libreconvat_native.so"),
                 os.path.join(here, "native", "libreconvat_native.so"),
                 os.environ.get("RECONVAT_NATIVE_LIB", "")):
        if not cand:
            continue
        cand = os.path.abspath(cand)
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.flac_decode_file.restype = ctypes.c_longlong
            lib.flac_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int16)]
            _NATIVE = lib
            return _NATIVE
    return None


def read_wav(path: str):
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        pcm = data
    elif data.dtype == np.int32:
        pcm = (data >> 16).astype(np.int16)
    elif data.dtype in (np.float32, np.float64):
        pcm = np.clip(data * 32768.0, -32768, 32767).astype(np.int16)
    elif data.dtype == np.uint8:
        pcm = ((data.astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"unsupported wav dtype {data.dtype} in {path}")
    if pcm.ndim == 2:  # downmix like soundfile's callers expect mono input
        pcm = pcm.mean(axis=1).astype(np.int16)
    return pcm, int(sr)


def read_flac(path: str):
    lib = _native_lib()
    if lib is None:
        raise RuntimeError(
            "FLAC decoding requires the native decoder; build it with "
            "`make -C native` (g++).")
    buf = ctypes.POINTER(ctypes.c_int16)()
    sr = ctypes.c_int(0)
    channels = ctypes.c_int(0)
    n = lib.flac_decode_file(path.encode(), ctypes.byref(buf),
                             ctypes.byref(sr), ctypes.byref(channels))
    if n < 0:
        raise ValueError(f"FLAC decode failed ({n}) for {path}")
    try:
        total = int(n) * channels.value
        pcm = np.ctypeslib.as_array(buf, shape=(total,)).copy()
    finally:
        lib.flac_free(buf)
    if channels.value > 1:
        pcm = pcm.reshape(-1, channels.value).mean(axis=1).astype(np.int16)
    return pcm, sr.value


def read_audio(path: str):
    """Returns (int16 mono pcm, sample_rate)."""
    lower = path.lower()
    if lower.endswith(".wav"):
        return read_wav(path)
    if lower.endswith(".flac"):
        return read_flac(path)
    raise ValueError(f"unsupported audio format: {path}")


def write_wav(path: str, pcm_int16: np.ndarray, sr: int):
    from scipy.io import wavfile

    wavfile.write(path, sr, np.asarray(pcm_int16, dtype=np.int16))
