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
