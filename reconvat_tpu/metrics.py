"""mir_eval-compatible transcription & multipitch metrics (pure numpy).

The environment has no mir_eval; these reimplement the exact metric
definitions the reference consumes (`model/evaluate_functions.py:68-117`):

* `precision_recall_f1_overlap` — note-level P/R/F1/average-overlap-ratio
  with 50 ms onset tolerance, 50-cent pitch tolerance, and optional offset
  criterion max(50 ms, 0.2 * ref duration); matching is *maximum* bipartite
  matching over admissible pairs, like `mir_eval.transcription`.
* `evaluate_multipitch` — framewise Poliner-Ellis scores incl. chroma
  variants, like `mir_eval.multipitch.evaluate` (identical time bases).
"""
from __future__ import annotations

import collections

import numpy as np


def _max_bipartite_matching(pairs, n_ref, n_est):
    """Maximum bipartite matching (augmenting paths). pairs: iterable of
    (ref_idx, est_idx) admissible edges. Returns list of matched pairs."""
    adj = collections.defaultdict(list)
    for r, e in pairs:
        adj[r].append(e)
    match_est = {}

    def try_assign(r, seen):
        for e in adj[r]:
            if e in seen:
                continue
            seen.add(e)
            if e not in match_est or try_assign(match_est[e], seen):
                match_est[e] = r
                return True
        return False

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000 + n_ref))
    try:
        for r in range(n_ref):
            if adj[r]:
                try_assign(r, set())
    finally:
        sys.setrecursionlimit(old)
    return [(r, e) for e, r in match_est.items()]


def match_notes(ref_intervals, ref_pitches, est_intervals, est_pitches,
                onset_tolerance=0.05, pitch_tolerance=50.0,
                offset_ratio=0.2, offset_min_tolerance=0.05):
    """Admissible-pair matching following mir_eval.transcription."""
    ref_intervals = np.atleast_2d(np.asarray(ref_intervals, dtype=float))
    est_intervals = np.atleast_2d(np.asarray(est_intervals, dtype=float))
    ref_pitches = np.asarray(ref_pitches, dtype=float)
    est_pitches = np.asarray(est_pitches, dtype=float)
    n_ref, n_est = len(ref_pitches), len(est_pitches)
    if n_ref == 0 or n_est == 0:
        return []

    onset_ok = (np.abs(ref_intervals[:, :1] - est_intervals[:, 0][None])
                <= onset_tolerance)
    cents = np.abs(1200.0 * np.log2(est_pitches[None, :]
                                    / ref_pitches[:, None]))
    pitch_ok = cents <= pitch_tolerance
    ok = onset_ok & pitch_ok
    if offset_ratio is not None:
        durations = ref_intervals[:, 1] - ref_intervals[:, 0]
        tol = np.maximum(offset_min_tolerance, offset_ratio * durations)
        offset_ok = (np.abs(ref_intervals[:, 1:2] - est_intervals[:, 1][None])
                     <= tol[:, None])
        ok = ok & offset_ok

    pairs = np.argwhere(ok)
    return _max_bipartite_matching([tuple(p) for p in pairs], n_ref, n_est)


def precision_recall_f1_overlap(ref_intervals, ref_pitches, est_intervals,
                                est_pitches, onset_tolerance=0.05,
                                pitch_tolerance=50.0, offset_ratio=0.2,
                                offset_min_tolerance=0.05, beta=1.0):
    """mir_eval.transcription.precision_recall_f1_overlap equivalent."""
    n_ref, n_est = len(ref_pitches), len(est_pitches)
    if n_ref == 0 or n_est == 0:
        return 0.0, 0.0, 0.0, 0.0
    matching = match_notes(ref_intervals, ref_pitches, est_intervals,
                           est_pitches, onset_tolerance, pitch_tolerance,
                           offset_ratio, offset_min_tolerance)
    precision = len(matching) / n_est
    recall = len(matching) / n_ref
    if precision + recall == 0:
        f_measure = 0.0
    else:
        f_measure = ((1 + beta ** 2) * precision * recall
                     / (beta ** 2 * precision + recall))

    if matching:
        ref_intervals = np.atleast_2d(np.asarray(ref_intervals, float))
        est_intervals = np.atleast_2d(np.asarray(est_intervals, float))
        ratios = []
        for r, e in matching:
            t0 = max(ref_intervals[r, 0], est_intervals[e, 0])
            t1 = min(ref_intervals[r, 1], est_intervals[e, 1])
            u0 = min(ref_intervals[r, 0], est_intervals[e, 0])
            u1 = max(ref_intervals[r, 1], est_intervals[e, 1])
            ratios.append((t1 - t0) / (u1 - u0) if u1 > u0 else 0.0)
        avg_overlap_ratio = float(np.mean(ratios))
    else:
        avg_overlap_ratio = 0.0
    return precision, recall, f_measure, avg_overlap_ratio


# ---------------------------------------------------------------------------
# Multipitch (framewise)
# ---------------------------------------------------------------------------

def _freqs_to_midi(freqs):
    return [12.0 * np.log2(np.asarray(f, dtype=float) / 440.0) + 69.0
            if len(f) else np.array([]) for f in freqs]


def _frame_matching_count(ref_midi, est_midi, window=0.5):
    """Number of matched pitches in one frame (maximum matching with
    +-window semitone tolerance)."""
    if len(ref_midi) == 0 or len(est_midi) == 0:
        return 0
    ok = np.abs(ref_midi[:, None] - est_midi[None, :]) <= window
    pairs = [tuple(p) for p in np.argwhere(ok)]
    return len(_max_bipartite_matching(pairs, len(ref_midi), len(est_midi)))


def evaluate_multipitch(ref_time, ref_freqs, est_time, est_freqs,
                        window=0.5):
    """mir_eval.multipitch.evaluate equivalent (shared time base).

    Returns the same key set: Precision/Recall/Accuracy, Poliner-Ellis
    error scores, and Chroma variants.
    """
    ref_time = np.asarray(ref_time)
    est_time = np.asarray(est_time)
    if len(ref_time) != len(est_time) or not np.allclose(ref_time, est_time):
        # nearest-neighbour resample of the estimate onto the ref time base
        idx = np.searchsorted(est_time, ref_time)
        idx = np.clip(idx, 0, len(est_time) - 1)
        prev = np.clip(idx - 1, 0, len(est_time) - 1)
        use_prev = (np.abs(est_time[prev] - ref_time)
                    < np.abs(est_time[idx] - ref_time))
        idx = np.where(use_prev, prev, idx)
        est_freqs = [est_freqs[i] for i in idx] if len(est_time) else \
            [np.array([]) for _ in ref_time]

    ref_midi = _freqs_to_midi(ref_freqs)
    est_midi = _freqs_to_midi(est_freqs)

    def _scores(ref_list, est_list):
        n_ref_total = n_est_total = tp_total = 0
        e_sub = e_miss = e_fa = e_tot = 0
        for r, e in zip(ref_list, est_list):
            n_ref, n_est = len(r), len(e)
            tp = _frame_matching_count(r, e, window)
            n_ref_total += n_ref
            n_est_total += n_est
            tp_total += tp
            e_sub += min(n_ref, n_est) - tp
            e_miss += max(0, n_ref - n_est)
            e_fa += max(0, n_est - n_ref)
            e_tot += max(n_ref, n_est) - tp
        precision = tp_total / n_est_total if n_est_total else 0.0
        recall = tp_total / n_ref_total if n_ref_total else 0.0
        fp = n_est_total - tp_total
        fn = n_ref_total - tp_total
        accuracy = (tp_total / (tp_total + fp + fn)
                    if tp_total + fp + fn else 0.0)
        denom = max(n_ref_total, 1)
        return dict(precision=precision, recall=recall, accuracy=accuracy,
                    e_sub=e_sub / denom, e_miss=e_miss / denom,
                    e_fa=e_fa / denom, e_tot=e_tot / denom)

    plain = _scores(ref_midi, est_midi)
    chroma_ref = [np.mod(r, 12) for r in ref_midi]
    chroma_est = [np.mod(e, 12) for e in est_midi]

    def _chroma_count(r, e):
        if len(r) == 0 or len(e) == 0:
            return 0
        d = np.abs(r[:, None] - e[None, :])
        d = np.minimum(d, 12 - d)  # circular chroma distance
        pairs = [tuple(p) for p in np.argwhere(d <= window)]
        return len(_max_bipartite_matching(pairs, len(r), len(e)))

    n_ref_total = sum(len(r) for r in chroma_ref)
    n_est_total = sum(len(e) for e in chroma_est)
    tp_total = sum(_chroma_count(r, e)
                   for r, e in zip(chroma_ref, chroma_est))
    e_sub = sum(min(len(r), len(e)) - _chroma_count(r, e)
                for r, e in zip(chroma_ref, chroma_est))
    e_miss = sum(max(0, len(r) - len(e))
                 for r, e in zip(chroma_ref, chroma_est))
    e_fa = sum(max(0, len(e) - len(r))
               for r, e in zip(chroma_ref, chroma_est))
    e_tot = sum(max(len(r), len(e)) - _chroma_count(r, e)
                for r, e in zip(chroma_ref, chroma_est))
    denom = max(n_ref_total, 1)
    fp = n_est_total - tp_total
    fn = n_ref_total - tp_total

    return {
        "Precision": plain["precision"],
        "Recall": plain["recall"],
        "Accuracy": plain["accuracy"],
        "Substitution Error": plain["e_sub"],
        "Miss Error": plain["e_miss"],
        "False Alarm Error": plain["e_fa"],
        "Total Error": plain["e_tot"],
        "Chroma Precision": tp_total / n_est_total if n_est_total else 0.0,
        "Chroma Recall": tp_total / n_ref_total if n_ref_total else 0.0,
        "Chroma Accuracy": (tp_total / (tp_total + fp + fn)
                            if tp_total + fp + fn else 0.0),
        "Chroma Substitution Error": e_sub / denom,
        "Chroma Miss Error": e_miss / denom,
        "Chroma False Alarm Error": e_fa / denom,
        "Chroma Total Error": e_tot / denom,
    }


def average_precision_score(y_true, y_score):
    """Micro average precision (sklearn-compatible, used for
    `metric/MusicNet/micro_avg_P`)."""
    try:
        from sklearn.metrics import average_precision_score as ap
        return float(ap(np.asarray(y_true).ravel(),
                        np.asarray(y_score).ravel()))
    except ImportError:
        y_true = np.asarray(y_true, float).ravel()
        y_score = np.asarray(y_score, float).ravel()
        order = np.argsort(-y_score, kind="stable")
        y_true = y_true[order]
        tp = np.cumsum(y_true)
        precision = tp / np.arange(1, len(y_true) + 1)
        n_pos = y_true.sum()
        if n_pos == 0:
            return 0.0
        return float(np.sum(precision * y_true) / n_pos)
