"""Decode / MIDI / label-roll parity tests against the reference."""
import numpy as np
import pytest

from reconvat_tpu import decode
from reconvat_tpu.data import labels, midi_io

from . import reference_oracle


def _rolls(seed=0, T=200, P=12, p_on=0.1, p_fr=0.3):
    rng = np.random.RandomState(seed)
    onsets = (rng.rand(T, P) < p_on).astype(np.float32)
    frames = np.maximum((rng.rand(T, P) < p_fr).astype(np.float32), onsets)
    # make them look like posteriograms
    onsets = onsets * (0.5 + 0.5 * rng.rand(T, P))
    frames = frames * (0.5 + 0.5 * rng.rand(T, P))
    return onsets, frames


@pytest.mark.parametrize("rule", ["rule1", "rule2"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_extract_notes_wo_velocity_matches_reference(rule, seed):
    torch = pytest.importorskip("torch")
    ref = reference_oracle.reference_module("decoding")
    onsets, frames = _rolls(seed)
    p_ref, i_ref = ref.extract_notes_wo_velocity(
        torch.tensor(onsets), torch.tensor(frames), rule=rule)
    p_got, i_got = decode.extract_notes_wo_velocity(onsets, frames, rule=rule)
    np.testing.assert_array_equal(p_got, p_ref)
    np.testing.assert_array_equal(np.asarray(i_got).reshape(-1, 2),
                                  np.asarray(i_ref).reshape(-1, 2))


def test_extract_notes_edge_cases():
    ref = reference_oracle.reference_module("decoding")
    torch = pytest.importorskip("torch")
    # note active through the end of the roll (end-of-roll break)
    onsets = np.zeros((6, 3), np.float32)
    frames = np.zeros((6, 3), np.float32)
    onsets[2, 1] = 1.0
    frames[2:, 1] = 1.0
    p_ref, i_ref = ref.extract_notes_wo_velocity(torch.tensor(onsets),
                                                 torch.tensor(frames))
    p_got, i_got = decode.extract_notes_wo_velocity(onsets, frames)
    np.testing.assert_array_equal(p_got, p_ref)
    np.testing.assert_array_equal(i_got, np.asarray(i_ref))
    assert i_got[0][1] == 6  # runs to end

    # empty roll
    p, i = decode.extract_notes_wo_velocity(np.zeros((4, 2)), np.zeros((4, 2)))
    assert len(p) == 0 and len(i) == 0


def _pack_host(roll_bool):
    """Host mirror of models.common.pack_roll_device's bit layout."""
    T, P = roll_bool.shape
    K = -(-P // 8)
    bits = np.pad(roll_bool.astype(np.uint8), ((0, 0), (0, K * 8 - P)))
    return np.packbits(bits, axis=-1, bitorder="little")


@pytest.mark.parametrize("rule", ["rule1", "rule2"])
@pytest.mark.parametrize("n_pitches", [88, 12, 64, 100])
def test_extract_notes_packed_batch_matches_float_path(rule, n_pitches):
    """The batched bit-packed native decode (serving hot path) must agree
    note-for-note with the parity-tested float path on every lane split
    (P < 64, = 64, 64 < P < 128)."""
    rng = np.random.RandomState(7)
    B, T = 5, 300
    out_expected, packed_on, packed_fr = [], [], []
    for b in range(B):
        on = rng.rand(T, n_pitches) < 0.05
        fr = (rng.rand(T, n_pitches) < 0.2) | on
        if b == 1:
            fr[:] = on  # aliased rolls (ReconVAT transcribe contract)
        if b == 2:
            on[:] = False
            fr[:] = False  # empty item inside the batch
        on[0, 0] = fr[0, 0] = b == 3  # first-frame edge
        packed_on.append(_pack_host(on))
        packed_fr.append(_pack_host(fr))
        out_expected.append(decode.extract_notes_wo_velocity(
            on.astype(np.float32), fr.astype(np.float32), rule=rule))
    got = decode.extract_notes_packed_batch(
        np.stack(packed_on), np.stack(packed_fr), n_pitches=n_pitches,
        rule=rule)
    assert len(got) == B
    for (p_exp, i_exp), (p_got, i_got) in zip(out_expected, got):
        np.testing.assert_array_equal(p_got, p_exp)
        np.testing.assert_array_equal(np.asarray(i_got).reshape(-1, 2),
                                      np.asarray(i_exp).reshape(-1, 2))


def test_extract_notes_packed_batch_default_frames_and_fallback():
    rng = np.random.RandomState(3)
    on = rng.rand(100, 88) < 0.04
    packed = _pack_host(on)[None]
    exp = decode.extract_notes_wo_velocity(on.astype(np.float32),
                                           on.astype(np.float32),
                                           rule="rule2")
    # frames_packed=None aliases the onset roll
    (p, i), = decode.extract_notes_packed_batch(packed)
    np.testing.assert_array_equal(p, exp[0])
    np.testing.assert_array_equal(np.asarray(i).reshape(-1, 2),
                                  np.asarray(exp[1]).reshape(-1, 2))
    # numpy fallback path (native disabled) must agree too
    import reconvat_tpu.decode as dec
    saved = dec._NATIVE
    dec._NATIVE = None
    try:
        (p2, i2), = decode.extract_notes_packed_batch(packed)
    finally:
        dec._NATIVE = saved
    np.testing.assert_array_equal(p2, p)
    np.testing.assert_array_equal(np.asarray(i2).reshape(-1, 2),
                                  np.asarray(i).reshape(-1, 2))


def test_pack_roll_device_layout():
    """Device packing and host unpack are inverse bijections, and the
    device layout equals np.packbits(bitorder='little')."""
    jnp = pytest.importorskip("jax.numpy")
    from reconvat_tpu.models.common import pack_roll_device

    rng = np.random.RandomState(11)
    probs = rng.rand(2, 50, 88).astype(np.float32)
    packed = np.asarray(pack_roll_device(jnp.asarray(probs)))
    expected = np.stack([_pack_host(probs[b] > 0.5) for b in range(2)])
    np.testing.assert_array_equal(packed, expected)
    np.testing.assert_array_equal(decode.unpack_roll(packed),
                                  probs > 0.5)


@pytest.mark.parametrize("seed", [0, 5])
def test_extract_notes_with_velocity_matches_reference(seed):
    torch = pytest.importorskip("torch")
    ref = reference_oracle.reference_module("decoding")
    onsets, frames = _rolls(seed)
    rng = np.random.RandomState(seed + 100)
    velocity = rng.rand(*onsets.shape).astype(np.float32)
    p_ref, i_ref, v_ref = ref.extract_notes(
        torch.tensor(onsets), torch.tensor(frames), torch.tensor(velocity))
    p_got, i_got, v_got = decode.extract_notes(onsets, frames, velocity)
    np.testing.assert_array_equal(p_got, p_ref)
    np.testing.assert_array_equal(np.asarray(i_got).reshape(-1, 2),
                                  np.asarray(i_ref).reshape(-1, 2))
    np.testing.assert_allclose(v_got, v_ref, rtol=1e-6, atol=1e-7)


def test_notes_to_frames_matches_reference():
    ref = reference_oracle.reference_module("decoding")
    onsets, frames = _rolls(7, T=50, P=5)
    p, i = decode.extract_notes_wo_velocity(onsets, frames)
    t_ref, f_ref = ref.notes_to_frames(p, i, (50, 5))
    t_got, f_got = decode.notes_to_frames(p, i, (50, 5))
    np.testing.assert_array_equal(t_got, t_ref)
    for a, b in zip(f_got, f_ref):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# MIDI
# ---------------------------------------------------------------------------

def test_midi_save_parse_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    n = 40
    onsets = np.sort(rng.rand(n) * 20)
    durations = 0.1 + rng.rand(n)
    intervals = np.stack([onsets, onsets + durations], 1)
    midi_notes = rng.randint(21, 109, n)
    pitches = midi_io.midi_to_hz(midi_notes)
    velocities = rng.rand(n)

    path = str(tmp_path / "x.mid")
    midi_io.save_midi(path, pitches, intervals, velocities)
    parsed = midi_io.parse_midi(path)

    # every note with nonzero truncated velocity must come back
    expect_keep = (velocities * 127).astype(int) > 0
    assert len(parsed) == expect_keep.sum()
    order = np.argsort(onsets[expect_keep], kind="stable")
    kept_notes = midi_notes[expect_keep][order]
    # tick truncation: int(time * 960) / 960 quantization
    expect_onsets = np.floor(onsets[expect_keep][order] * 960) / 960
    got_notes = parsed[:, 2].astype(int)
    # note numbers match (parse order may differ for equal onsets)
    np.testing.assert_array_equal(np.sort(got_notes), np.sort(kept_notes))
    np.testing.assert_allclose(np.sort(parsed[:, 0]), np.sort(expect_onsets),
                               atol=1e-9)


def test_parse_midi_sustain_pedal(tmp_path):
    # hand-build a file: note on at t=0, note off at 1s, pedal down from
    # 0.5s to 2s -> offset must extend to pedal release (2s)
    tpb = 480  # default tempo 500000 -> 960 ticks per second
    ev = [
        (0, [0x90, 60, 64]),
        (480, [0xB0, 64, 127]),   # sustain on at 0.5 s
        (960, [0x80, 60, 0]),     # note off at 1.0 s
        (1920, [0xB0, 64, 0]),    # sustain off at 2.0 s
    ]
    path = str(tmp_path / "sus.mid")
    midi_io.write_midi_events(path, [ev], tpb)
    notes = midi_io.parse_midi(path)
    assert notes.shape == (1, 4)
    onset, offset, note, vel = notes[0]
    assert onset == 0.0 and note == 60 and vel == 64
    np.testing.assert_allclose(offset, 2.0)


def test_parse_midi_tempo_change(tmp_path):
    # tempo change mid-file alters seconds conversion
    tpb = 480
    ev = [
        (0, [0xFF, 0x51, 0x03, 0x07, 0xA1, 0x20]),  # 500000 us/beat
        (0, [0x90, 60, 100]),
        (480, [0xFF, 0x51, 0x03, 0x03, 0xD0, 0x90]),  # 250000 us/beat at 0.5s
        (960, [0x80, 60, 0]),  # 480 ticks later at doubled speed => +0.25 s
    ]
    path = str(tmp_path / "tempo.mid")
    midi_io.write_midi_events(path, [ev], tpb)
    notes = midi_io.parse_midi(path)
    np.testing.assert_allclose(notes[0, 0], 0.0)
    np.testing.assert_allclose(notes[0, 1], 0.75)


# ---------------------------------------------------------------------------
# Label rolls
# ---------------------------------------------------------------------------

def test_tsv_to_rolls_semantics():
    audio_len = 512 * 100 + 1
    rows = np.array([
        # onset at step 10, offset step 20
        [10 * 512 / 16000, 20 * 512 / 16000, 60, 80],
        # runs past the end
        [95 * 512 / 16000, 200 * 512 / 16000, 100, 50],
    ])
    label, velocity = labels.tsv_to_rolls(rows, audio_len)
    assert label.shape == (101, 88)
    f = 60 - 21
    assert (label[10, f] == 3 and label[11:20, f] == 2).all()
    assert label[20, f] == 1 and label[21, f] == 0
    assert velocity[10:20, f].max() == 80 and velocity[20, f] == 0
    f2 = 100 - 21
    assert label[95, f2] == 3 and (label[96:, f2] == 2).all()

    onset, offset, frame = labels.label_to_masks(label)
    assert onset[10, f] == 1 and frame[10:20, f].all() and offset[20, f] == 1


def test_tsv_to_rolls_matches_reference_loader():
    """Cross-check the roll codes against the reference load() math."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(11)
    n = 30
    onset = np.sort(rng.rand(n) * 30)
    rows = np.stack([onset, onset + 0.05 + rng.rand(n),
                     rng.randint(21, 109, n), rng.randint(1, 128, n)], 1)
    audio_len = 16000 * 32
    label, velocity = labels.tsv_to_rolls(rows, audio_len)

    # independent re-implementation straight from the reference description
    n_steps = (audio_len - 1) // 512 + 1
    exp = np.zeros((n_steps, 88), np.uint8)
    exp_vel = np.zeros((n_steps, 88), np.uint8)
    for on, off, note, vel in rows:
        left = int(round(on * 16000 / 512))
        onset_right = min(n_steps, left + 1)
        frame_right = min(n_steps, int(round(off * 16000 / 512)))
        offset_right = min(n_steps, frame_right + 1)
        f = int(note) - 21
        exp[left:onset_right, f] = 3
        exp[onset_right:frame_right, f] = 2
        exp[frame_right:offset_right, f] = 1
        exp_vel[left:frame_right, f] = vel
    np.testing.assert_array_equal(label, exp)
    np.testing.assert_array_equal(velocity, exp_vel)


def test_notes_to_roll_matches_slice_assignment():
    """Vectorized diff+cumsum roll == one slice assignment per note,
    including overlapping same-pitch notes and offsets past the end."""
    rng = np.random.RandomState(5)
    for trial in range(20):
        T, K = rng.randint(4, 60), rng.randint(2, 90)
        n = rng.randint(0, 40)
        on = rng.randint(0, T, size=n)
        off = on + rng.randint(0, T, size=n)  # may exceed T
        p = rng.randint(0, K, size=n)
        want = np.zeros((T, K))
        for pitch, (o, f) in zip(p, zip(on, off)):
            want[o:f, pitch] = 1
        got = decode.notes_to_roll(p, np.stack([on, off], 1), (T, K))
        np.testing.assert_array_equal(got, want, err_msg=str(trial))
