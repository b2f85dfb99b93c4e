"""Posteriogram -> note-event decoding (host side, vectorized numpy).

Reproduces the reference decoding semantics exactly (reference
`model/decoding.py:4-130`) but replaces the per-note Python while-loop with
vectorized scans, so full-song decoding is O(T*P) numpy instead of a
Python-interpreter hot loop.

Semantics preserved bit-for-bit:
  * thresholds are strict `>` comparisons;
  * `onset_diff` keeps only rising edges (first frame counts as an edge);
  * rule1 additionally requires the frame channel active at the onset,
    rule2 does not;
  * a note extends while (onset | frame) stays active and ends at the first
    inactive step (or the end of the roll);
  * notes are emitted in row-major (time, pitch) order of their onsets.
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
    if os.environ.get("RECONVAT_NO_NATIVE"):
        return None
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cand = os.path.join(here, "native", "libreconvat_native.so")
    if os.path.exists(cand):
        lib = ctypes.CDLL(cand)
        lib.extract_notes.restype = ctypes.c_longlong
        lib.extract_notes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))]
        lib.notes_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        if hasattr(lib, "extract_notes_packed_batch"):
            lib.extract_notes_packed_batch.restype = ctypes.c_longlong
            lib.extract_notes_packed_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64)]
        _NATIVE = lib
    return _NATIVE


def _extract_notes_native(onsets, frames, onset_threshold, frame_threshold,
                          rule):
    lib = _native_lib()
    if lib is None:
        return None
    on = np.ascontiguousarray(onsets, dtype=np.float32)
    fr = np.ascontiguousarray(frames, dtype=np.float32)
    if on.ndim != 2 or fr.shape != on.shape:
        return None
    T, P = on.shape
    buf = ctypes.POINTER(ctypes.c_int32)()
    n = lib.extract_notes(
        on.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T, P, onset_threshold, frame_threshold,
        1 if rule == "rule1" else 0, ctypes.byref(buf))
    if n < 0:
        return None
    try:
        if n == 0:
            return np.array([]), np.array([])
        arr = np.ctypeslib.as_array(buf, shape=(int(n), 3)).copy()
    finally:
        lib.notes_free(buf)
    return arr[:, 0], arr[:, 1:3]


def unpack_roll(packed, n_pitches=88):
    """Bit-packed (..., K) uint8 roll -> boolean (..., n_pitches).

    Inverse of the device-side packing (bit j of byte k = pitch k*8+j,
    little bit order — the layout `pack_roll_device` and bench.py emit).
    """
    packed = np.asarray(packed, dtype=np.uint8)
    bits = np.unpackbits(packed, axis=-1, bitorder="little")
    return bits[..., :n_pitches].astype(bool)


def extract_notes_packed_batch(onsets_packed, frames_packed=None,
                               n_pitches=88, rule="rule2"):
    """Decode a batch of device-thresholded, bit-packed rolls to notes.

    The serving hot path: the device thresholds the posteriogram at 0.5
    and packs it to bits (32x smaller D2H transfer); this decodes the
    whole (B, T, K) batch in ONE native call (bitwise rising-edge
    detection on 64-bit lanes; the GIL is released for the duration).
    Returns a list of B (pitches (N,), intervals (N, 2)) pairs with
    exactly the semantics of `extract_notes_wo_velocity` on the unpacked
    rolls (reference `model/decoding.py:4-55`; thresholding already
    happened on device).

    `frames_packed=None` reuses the onset roll as the frame roll — the
    ReconVAT transcribe contract (`model/self_attention_VAT.py:1309-1312`
    returns onset = frame = pianoroll).
    """
    if rule not in ("rule1", "rule2"):
        raise NameError("Please enter the correct rule name")
    on = np.ascontiguousarray(onsets_packed, dtype=np.uint8)
    if on.ndim != 3:
        raise ValueError(f"expected (B, T, K) packed roll, got {on.shape}")
    fr = on if frames_packed is None else np.ascontiguousarray(
        frames_packed, dtype=np.uint8)
    if fr.shape != on.shape:
        raise ValueError("onset/frame packed shapes differ")
    B, T, K = on.shape
    if K != (n_pitches + 7) // 8:
        raise ValueError(f"K={K} does not match n_pitches={n_pitches}")

    lib = _native_lib()
    if lib is not None and hasattr(lib, "extract_notes_packed_batch"):
        buf = ctypes.POINTER(ctypes.c_int32)()
        counts = (ctypes.c_int64 * B)()
        n = lib.extract_notes_packed_batch(
            on.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            fr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            B, T, K, n_pitches, 1 if rule == "rule1" else 0,
            ctypes.byref(buf), counts)
        if n >= 0:
            try:
                if n == 0:
                    flat = np.zeros((0, 3), np.int32)
                else:
                    flat = np.ctypeslib.as_array(
                        buf, shape=(int(n), 3)).copy()
            finally:
                lib.notes_free(buf)
            out, pos = [], 0
            for b in range(B):
                c = int(counts[b])
                chunk = flat[pos:pos + c]
                pos += c
                if c == 0:
                    out.append((np.array([]), np.array([])))
                else:
                    out.append((chunk[:, 0], chunk[:, 1:3]))
            return out

    # numpy fallback: unpack and reuse the float-roll path (bits are
    # 0/1, so the default 0.5 thresholds reproduce the device threshold)
    on_b = unpack_roll(on, n_pitches)
    fr_b = on_b if frames_packed is None else unpack_roll(fr, n_pitches)
    return [extract_notes_wo_velocity(on_b[b], fr_b[b], rule=rule)
            for b in range(B)]


def _as_bool(x, threshold):
    x = np.asarray(x)
    return x > threshold


def _next_inactive(active: np.ndarray) -> np.ndarray:
    """For boolean (T, P): index of the first inactive step at or after t.

    Returns int array (T+1, P); value T means "active through the end".
    """
    T, P = active.shape
    idx = np.where(~active, np.arange(T)[:, None], T).astype(np.int64)
    # reverse cumulative minimum: first inactive index >= t
    nz = np.minimum.accumulate(idx[::-1], axis=0)[::-1]
    return np.concatenate([nz, np.full((1, P), T, dtype=np.int64)], axis=0)


def extract_notes_wo_velocity(onsets, frames, onset_threshold=0.5,
                              frame_threshold=0.5, rule="rule1"):
    """Find note (pitch, [onset, offset]) events from onset/frame rolls.

    onsets, frames: float arrays (T, P). Returns (pitches (N,), intervals
    (N, 2)) in frame indices, matching reference
    `extract_notes_wo_velocity` (`model/decoding.py:4-55`).
    """
    if rule not in ("rule1", "rule2"):
        raise NameError("Please enter the correct rule name")

    native = _extract_notes_native(np.asarray(onsets), np.asarray(frames),
                                   onset_threshold, frame_threshold, rule)
    if native is not None:
        return native

    on = _as_bool(onsets, onset_threshold)
    fr = _as_bool(frames, frame_threshold)

    onset_diff = np.concatenate([on[:1], on[1:] & ~on[:-1]], axis=0)
    if rule == "rule1":
        onset_diff = onset_diff & fr

    starts = np.argwhere(onset_diff)  # row-major (t, p), sorted by t then p
    if len(starts) == 0:
        return np.array([]), np.array([])

    active = on | fr
    nz = _next_inactive(active)
    t, p = starts[:, 0], starts[:, 1]
    offsets = nz[t, p]

    keep = offsets > t
    pitches = p[keep]
    intervals = np.stack([t[keep], offsets[keep]], axis=1)
    return pitches, intervals


def extract_notes(onsets, frames, velocity, onset_threshold=0.5,
                  frame_threshold=0.5):
    """Note events + mean onset-channel velocity per note.

    Matches reference `extract_notes` (`model/decoding.py:58-106`): velocity
    samples are collected at steps where the onset channel stays active
    within [onset, offset).
    """
    on = _as_bool(onsets, onset_threshold)
    fr = _as_bool(frames, frame_threshold)
    velocity = np.asarray(velocity)

    onset_diff = np.concatenate([on[:1], on[1:] & ~on[:-1]], axis=0)
    starts = np.argwhere(onset_diff)
    if len(starts) == 0:
        return np.array([]), np.array([]), np.array([])

    active = on | fr
    nz = _next_inactive(active)
    t, p = starts[:, 0], starts[:, 1]
    offsets = nz[t, p]

    # cumulative sums for velocity averaging over active-onset steps
    onf = on.astype(np.float64)
    cs_v = np.concatenate([np.zeros((1,) + on.shape[1:]),
                           np.cumsum(velocity * onf, axis=0)], axis=0)
    cs_n = np.concatenate([np.zeros((1,) + on.shape[1:]),
                           np.cumsum(onf, axis=0)], axis=0)

    keep = offsets > t
    t, p, offsets = t[keep], p[keep], offsets[keep]
    vsum = cs_v[offsets, p] - cs_v[t, p]
    vcnt = cs_n[offsets, p] - cs_n[t, p]
    vels = np.where(vcnt > 0, vsum / np.maximum(vcnt, 1), 0.0)

    intervals = np.stack([t, offsets], axis=1)
    return p, intervals, vels


def notes_to_roll(pitches, intervals, shape):
    """Note list -> binary pianoroll (the dense half of notes_to_frames;
    `metrics.evaluate_multipitch_rolls` consumes it directly).

    Interval-union via a +1/-1 difference array + cumsum instead of one
    slice assignment per note: identical to `roll[on:off, p] = 1` per
    note (overlaps union to 1 either way)."""
    shape = tuple(shape)
    pitches = np.asarray(pitches, dtype=np.int64).ravel()
    if len(pitches) == 0:
        return np.zeros(shape)
    iv = np.asarray(intervals, dtype=np.int64).reshape(-1, 2)
    on = np.clip(iv[:, 0], 0, shape[0])
    off = np.clip(np.maximum(iv[:, 1], on), 0, shape[0])
    diff = np.zeros((shape[0] + 1, shape[1]), dtype=np.int64)
    np.add.at(diff, (on, pitches), 1)
    np.add.at(diff, (off, pitches), -1)
    return (np.cumsum(diff[:-1], axis=0) > 0).astype(float)


def notes_to_frames(pitches, intervals, shape):
    """Note list -> per-frame active-pitch lists for multipitch metrics.

    Matches reference `notes_to_frames` (`model/decoding.py:109-130`).
    """
    roll = notes_to_roll(pitches, intervals, shape)
    time = np.arange(roll.shape[0])
    freqs = [roll[t, :].nonzero()[0] for t in time]
    return time, freqs
