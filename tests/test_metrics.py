"""Metric-definition tests (mir_eval semantics, hand-computed cases)."""
import numpy as np

from reconvat_tpu import metrics


def test_perfect_transcription():
    iv = np.array([[0.0, 1.0], [1.0, 2.0], [2.5, 3.0]])
    p = np.array([440.0, 220.0, 880.0])
    pr, rc, f1, ov = metrics.precision_recall_f1_overlap(iv, p, iv, p)
    assert pr == rc == f1 == 1.0
    assert ov == 1.0


def test_onset_tolerance_50ms():
    iv_ref = np.array([[0.0, 1.0]])
    p = np.array([440.0])
    # 49 ms off: match (offset criterion disabled)
    iv_est = np.array([[0.049, 1.0]])
    _, _, f1, _ = metrics.precision_recall_f1_overlap(
        iv_ref, p, iv_est, p, offset_ratio=None)
    assert f1 == 1.0
    # 51 ms off: no match
    iv_est = np.array([[0.051, 1.0]])
    _, _, f1, _ = metrics.precision_recall_f1_overlap(
        iv_ref, p, iv_est, p, offset_ratio=None)
    assert f1 == 0.0


def test_pitch_tolerance_50_cents():
    iv = np.array([[0.0, 1.0]])
    ref_p = np.array([440.0])
    ok_p = np.array([440.0 * 2 ** (0.49 / 12)])     # 49 cents sharp
    bad_p = np.array([440.0 * 2 ** (0.51 / 12)])    # 51 cents sharp
    assert metrics.precision_recall_f1_overlap(
        iv, ref_p, iv, ok_p, offset_ratio=None)[2] == 1.0
    assert metrics.precision_recall_f1_overlap(
        iv, ref_p, iv, bad_p, offset_ratio=None)[2] == 0.0


def test_offset_criterion():
    p = np.array([440.0])
    iv_ref = np.array([[0.0, 1.0]])
    # offset tolerance = max(0.05, 0.2 * 1.0) = 0.2
    assert metrics.precision_recall_f1_overlap(
        iv_ref, p, np.array([[0.0, 1.19]]), p)[2] == 1.0
    assert metrics.precision_recall_f1_overlap(
        iv_ref, p, np.array([[0.0, 1.21]]), p)[2] == 0.0
    # short ref note: min tolerance 50 ms applies
    iv_ref = np.array([[0.0, 0.1]])
    assert metrics.precision_recall_f1_overlap(
        iv_ref, p, np.array([[0.0, 0.149]]), p)[2] == 1.0


def test_maximum_matching_beats_greedy():
    """Two refs, two ests where greedy first-fit would match only one."""
    # ref A at t=0.00, ref B at t=0.04; est X at 0.04, est Y at 0.08.
    # A-X, B-X, B-Y admissible (50ms tol). Max matching: A-X, B-Y (2 pairs).
    iv_ref = np.array([[0.00, 1.0], [0.04, 1.0]])
    iv_est = np.array([[0.04, 1.0], [0.08, 1.0]])
    p = np.array([440.0, 440.0])
    pr, rc, f1, _ = metrics.precision_recall_f1_overlap(
        iv_ref, p, iv_est, p, offset_ratio=None)
    assert pr == rc == f1 == 1.0


def test_empty_cases():
    iv = np.array([[0.0, 1.0]])
    p = np.array([440.0])
    assert metrics.precision_recall_f1_overlap(
        np.zeros((0, 2)), np.array([]), iv, p) == (0.0, 0.0, 0.0, 0.0)
    assert metrics.precision_recall_f1_overlap(
        iv, p, np.zeros((0, 2)), np.array([])) == (0.0, 0.0, 0.0, 0.0)


def test_overlap_ratio_value():
    iv_ref = np.array([[0.0, 1.0]])
    iv_est = np.array([[0.0, 0.5]])  # intersection 0.5, union 1.0
    p = np.array([440.0])
    _, _, _, ov = metrics.precision_recall_f1_overlap(
        iv_ref, p, iv_est, p, offset_ratio=None)
    np.testing.assert_allclose(ov, 0.5)


def test_multipitch_scores():
    t = np.arange(4) * 0.032
    hz = lambda m: 440.0 * 2 ** ((np.asarray(m) - 69) / 12)
    ref = [hz([60, 64]), hz([60]), hz([]), hz([62])]
    est = [hz([60, 64]), hz([61]), hz([60]), hz([62, 70])]
    out = metrics.evaluate_multipitch(t, ref, t, est)
    # TP: frame0 2, frame1 0, frame2 0, frame3 1 => 3; n_ref = 2+1+0+1 = 4
    n_ref, n_est, tp = 4, 6, 3
    np.testing.assert_allclose(out["Precision"], tp / n_est)
    np.testing.assert_allclose(out["Recall"], tp / n_ref)
    np.testing.assert_allclose(
        out["Accuracy"], tp / (tp + (n_est - tp) + (n_ref - tp)))
    # Poliner-Ellis errors per frame (sub, miss, fa):
    # frame0: (0,0,0); frame1: (1,0,0); frame2: (0,0,1); frame3: (0,0,1)
    np.testing.assert_allclose(out["Substitution Error"], 1 / 4)
    np.testing.assert_allclose(out["Miss Error"], 0.0)
    np.testing.assert_allclose(out["False Alarm Error"], 2 / 4)
    np.testing.assert_allclose(out["Total Error"], 3 / 4)
    # chroma: frame1 est 61 still !~ 60; same numbers here
    np.testing.assert_allclose(out["Chroma Recall"], 3 / 4)


def test_multipitch_chroma_wraps_octave():
    t = np.arange(1) * 0.032
    hz = lambda m: 440.0 * 2 ** ((np.asarray(m) - 69) / 12)
    out = metrics.evaluate_multipitch(t, [hz([60])], t, [hz([72])])
    assert out is not None
    assert out["Precision"] == 0.0
    assert out["Chroma Precision"] == 1.0


def test_average_precision_matches_sklearn():
    rng = np.random.RandomState(0)
    y = (rng.rand(500) > 0.8).astype(float)
    s = rng.rand(500) * 0.5 + y * 0.3
    from sklearn.metrics import average_precision_score as skap
    np.testing.assert_allclose(metrics.average_precision_score(y, s),
                               skap(y, s), rtol=1e-9)


def _general_multipitch(t, ref, est, window=0.5):
    """Force the pre-fast-path per-frame bipartite scoring (oracle)."""
    from reconvat_tpu.metrics import (_frame_matching_count,
                                      _freqs_to_midi,
                                      _max_bipartite_matching)

    ref_midi = _freqs_to_midi(ref)
    est_midi = _freqs_to_midi(est)

    def chroma_count(r, e):
        if len(r) == 0 or len(e) == 0:
            return 0
        d = np.abs(r[:, None] - e[None, :])
        d = np.minimum(d, 12 - d)
        pairs = [tuple(p) for p in np.argwhere(d <= window)]
        return len(_max_bipartite_matching(pairs, len(r), len(e)))

    def scores(ref_list, est_list, count_fn):
        nr = ne = tp = e_sub = e_miss = e_fa = e_tot = 0
        for r, e in zip(ref_list, est_list):
            c = count_fn(r, e)
            nr += len(r); ne += len(e); tp += c
            e_sub += min(len(r), len(e)) - c
            e_miss += max(0, len(r) - len(e))
            e_fa += max(0, len(e) - len(r))
            e_tot += max(len(r), len(e)) - c
        denom = max(nr, 1)
        fp, fn = ne - tp, nr - tp
        return dict(precision=tp / ne if ne else 0.0,
                    recall=tp / nr if nr else 0.0,
                    accuracy=tp / (tp + fp + fn) if tp + fp + fn else 0.0,
                    e_sub=e_sub / denom, e_miss=e_miss / denom,
                    e_fa=e_fa / denom, e_tot=e_tot / denom)

    plain = scores(ref_midi, est_midi,
                   lambda r, e: _frame_matching_count(r, e, window))
    chrom = scores([np.mod(r, 12) for r in ref_midi],
                   [np.mod(e, 12) for e in est_midi], chroma_count)
    return plain, chrom


def test_multipitch_fast_path_equals_general_randomized():
    """Integer fast path == per-frame bipartite path, bit-for-bit, on
    random integer-pitch corpora (the transcription pipeline's regime)."""
    hz = lambda m: 440.0 * 2 ** ((np.asarray(m, float) - 69) / 12)
    rng = np.random.RandomState(7)
    for trial in range(20):
        T = rng.randint(1, 40)
        t = np.arange(T) * 0.032
        ref = [hz(rng.choice(108, size=rng.randint(0, 6), replace=False)
                  + 21) for _ in range(T)]
        est = [hz(rng.choice(108, size=rng.randint(0, 6), replace=False)
                  + 21) for _ in range(T)]
        out = metrics.evaluate_multipitch(t, ref, t, est)
        plain, chrom = _general_multipitch(t, ref, est)
        for k, v in [("Precision", plain["precision"]),
                     ("Recall", plain["recall"]),
                     ("Accuracy", plain["accuracy"]),
                     ("Substitution Error", plain["e_sub"]),
                     ("Miss Error", plain["e_miss"]),
                     ("False Alarm Error", plain["e_fa"]),
                     ("Total Error", plain["e_tot"]),
                     ("Chroma Precision", chrom["precision"]),
                     ("Chroma Recall", chrom["recall"]),
                     ("Chroma Accuracy", chrom["accuracy"]),
                     ("Chroma Substitution Error", chrom["e_sub"]),
                     ("Chroma Miss Error", chrom["e_miss"]),
                     ("Chroma False Alarm Error", chrom["e_fa"]),
                     ("Chroma Total Error", chrom["e_tot"])]:
            assert out[k] == v, (trial, k, out[k], v)


def test_multipitch_non_integer_falls_back():
    """Detuned (non-integer-MIDI) pitches must take the general path and
    still honor the +-window semitone tolerance."""
    t = np.arange(1) * 0.032
    hz = lambda m: 440.0 * 2 ** ((np.asarray(m, float) - 69) / 12)
    out = metrics.evaluate_multipitch(t, [hz([60.0])], t, [hz([60.4])])
    assert out["Precision"] == 1.0  # 0.4 semitones within 0.5 window
    out = metrics.evaluate_multipitch(t, [hz([60.0])], t, [hz([60.6])])
    assert out["Precision"] == 0.0


def test_multipitch_rolls_equals_lists():
    """evaluate_multipitch_rolls(roll_ref, roll_est) == the reference's
    notes_to_frames + Hz-list path through evaluate_multipitch."""
    from reconvat_tpu.data.midi_io import midi_to_hz

    rng = np.random.RandomState(3)
    for trial in range(10):
        T = rng.randint(1, 60)
        roll_ref = (rng.rand(T, 88) > 0.9).astype(float)
        roll_est = (rng.rand(T, 88) > 0.9).astype(float)
        t = np.arange(T) * 0.032
        to_lists = lambda roll: [
            np.array([midi_to_hz(21 + m) for m in row.nonzero()[0]])
            for row in roll]
        want = metrics.evaluate_multipitch(t, to_lists(roll_ref),
                                           t, to_lists(roll_est))
        got = metrics.evaluate_multipitch_rolls(roll_ref, roll_est, 21)
        assert want == got, trial


def test_match_notes_tolerance_boundaries_survive_window_search():
    """Candidates exactly at the onset-tolerance boundary must be kept
    (the window search widens, the exact predicate decides)."""
    # onset difference == the tolerance float exactly: admissible (<=)
    m = metrics.match_notes(np.array([[0.00, 2.0]]), np.array([440.0]),
                            np.array([[0.05, 2.0]]), np.array([440.0]),
                            offset_ratio=None)
    assert m == [(0, 0)]
    # just beyond: rejected by the exact predicate, not the window
    m = metrics.match_notes(np.array([[0.00, 2.0]]), np.array([440.0]),
                            np.array([[0.0500001, 2.0]]), np.array([440.0]),
                            offset_ratio=None)
    assert m == []


def test_match_notes_matching_identical_to_dense_path():
    """The windowed candidate search must reproduce the dense argwhere
    path's *matching* (same pairs, same order), not just its size —
    avg-overlap depends on which maximum matching is returned."""
    from reconvat_tpu.metrics import _max_bipartite_matching

    rng = np.random.RandomState(11)
    for trial in range(50):
        n_ref, n_est = rng.randint(1, 30), rng.randint(1, 30)
        ref_i = np.sort(rng.rand(n_ref) * 3.0)[:, None]
        ref_i = np.concatenate([ref_i, ref_i + 0.1 + rng.rand(n_ref, 1)], 1)
        est_i = np.sort(rng.rand(n_est) * 3.0)[:, None]
        est_i = np.concatenate([est_i, est_i + 0.1 + rng.rand(n_est, 1)], 1)
        ref_p = 440.0 * 2 ** ((rng.randint(21, 60, n_ref) - 69) / 12.0)
        est_p = 440.0 * 2 ** ((rng.randint(21, 60, n_est) - 69) / 12.0)
        for offset_ratio in (None, 0.2):
            got = metrics.match_notes(ref_i, ref_p, est_i, est_p,
                                      onset_tolerance=0.3,
                                      offset_ratio=offset_ratio)
            # dense oracle (the pre-optimization implementation)
            onset_ok = np.abs(ref_i[:, :1] - est_i[:, 0][None]) <= 0.3
            cents = np.abs(1200.0 * np.log2(est_p[None] / ref_p[:, None]))
            ok = onset_ok & (cents <= 50.0)
            if offset_ratio is not None:
                tol = np.maximum(0.05, offset_ratio
                                 * (ref_i[:, 1] - ref_i[:, 0]))
                ok &= (np.abs(ref_i[:, 1:2] - est_i[:, 1][None])
                       <= tol[:, None])
            want = _max_bipartite_matching(
                [tuple(p) for p in np.argwhere(ok)], n_ref, n_est)
            assert sorted(got) == sorted(want), (trial, offset_ratio)
            assert got == want, (trial, offset_ratio)
