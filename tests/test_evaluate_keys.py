"""evaluate_wo_velocity must emit exactly the reference's metric keys."""
import numpy as np

import jax

from reconvat_tpu.evaluate import evaluate_wo_velocity
from reconvat_tpu.models.reconvat import ReconVAT


def _songs(n=2, frames=40):
    rng = np.random.RandomState(0)
    for i in range(n):
        yield {
            "path": f"song{i}.flac",
            "audio": (rng.randn(frames * 512) * 0.1).astype(np.float32),
            "frame": (rng.rand(frames, 88) > 0.9).astype(np.float32),
            "onset": (rng.rand(frames, 88) > 0.97).astype(np.float32),
        }


def test_metric_keys_match_reference(tmp_path):
    model = ReconVAT(reconstruction=True)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=40)

    def runner(item):
        batch = {k: (np.asarray(v)[None] if k != "path" else v)
                 for k, v in item.items()}
        p, l, s, _ = model.run_on_batch(variables, batch, None,
                                        jax.random.PRNGKey(0), vat=False,
                                        train=False)
        return p, l, s

    results = evaluate_wo_velocity(list(_songs()), runner,
                                   reconstruction=True,
                                   save_path=str(tmp_path))

    # metric keys from the reference's evaluate_wo_velocity
    # (`model/evaluate_functions.py:68-117`) with reconstruction=True
    expect_metrics = {
        "metric/note/precision", "metric/note/recall", "metric/note/f1",
        "metric/note/overlap",
        "metric/note-with-offsets/precision",
        "metric/note-with-offsets/recall", "metric/note-with-offsets/f1",
        "metric/note-with-offsets/overlap",
        "metric/frame/f1", "metric/MusicNet/micro_avg_P",
        "metric/note/precision_2", "metric/note/recall_2",
        "metric/note/f1_2", "metric/note/overlap_2",
        "metric/frame/f1_2", "metric/MusicNet/micro_avg_P2",
        "metric/note-with-offsets/precision_2",
        "metric/note-with-offsets/recall_2",
        "metric/note-with-offsets/f1_2",
        "metric/note-with-offsets/overlap_2",
        # frame_metrics dict keys, lowercased with spaces -> underscores
        "metric/frame/precision", "metric/frame/recall",
        "metric/frame/accuracy", "metric/frame/substitution_error",
        "metric/frame/miss_error", "metric/frame/false_alarm_error",
        "metric/frame/total_error", "metric/frame/chroma_precision",
        "metric/frame/chroma_recall", "metric/frame/chroma_accuracy",
        "metric/frame/chroma_substitution_error",
        "metric/frame/chroma_miss_error",
        "metric/frame/chroma_false_alarm_error",
        "metric/frame/chroma_total_error",
        # second-view entries the reference injects into frame_metrics
        "metric/frame/precision_2", "metric/frame/recall_2",
        "metric/frame/accuracy_2",
    }
    got_metrics = {k for k in results if k.startswith("metric/")}
    assert got_metrics == expect_metrics, (
        got_metrics - expect_metrics, expect_metrics - got_metrics)
    # loss keys come from run_on_batch (test_ prefixed)
    assert any(k.startswith("loss/test") for k in results)
    # every metric has one entry per song
    for k in expect_metrics:
        assert len(results[k]) == 2, k
    # artifacts written
    import os

    files = os.listdir(tmp_path)
    assert any(f.endswith(".pred.mid") for f in files)
    assert any(f.endswith(".label.png") for f in files)

def test_evaluate_pipeline_depth_identical():
    """The lookahead pipeline must not change any metric value or order
    (only the moment the host realizes each song's outputs moves)."""
    rng = np.random.RandomState(1)

    def runner(item):
        r = np.random.RandomState(int(item["path"][4]))
        frames = item["frame"].shape[0]
        pred = {
            "onset": r.rand(1, frames, 88).astype(np.float32),
            "frame": r.rand(1, frames, 88).astype(np.float32),
        }
        return pred, {"loss/test_frame": np.float32(r.rand())}, None

    songs = list(_songs(n=4, frames=30))
    base = evaluate_wo_velocity(songs, runner, reconstruction=False,
                                pipeline=0)
    for depth in (1, 3, 10):
        got = evaluate_wo_velocity(songs, runner, reconstruction=False,
                                   pipeline=depth)
        assert set(got) == set(base)
        for k in base:
            assert got[k] == base[k], (k, depth)


def test_evaluate_host_workers_identical(tmp_path):
    """Thread-pooled per-song scoring (host_workers) must reproduce the
    synchronous loop exactly — same values, same corpus order, same
    artifacts — for any worker count."""
    def runner(item):
        r = np.random.RandomState(int(item["path"][4]))
        frames = item["frame"].shape[0]
        pred = {
            "onset": r.rand(1, frames, 88).astype(np.float32),
            "frame": r.rand(1, frames, 88).astype(np.float32),
            "onset2": r.rand(1, frames, 88).astype(np.float32),
            "frame2": r.rand(1, frames, 88).astype(np.float32),
        }
        return pred, {"loss/test_frame": np.float32(r.rand())}, None

    songs = list(_songs(n=6, frames=30))
    base = evaluate_wo_velocity(songs, runner, reconstruction=True,
                                host_workers=0)
    import os

    for workers in (2, 4):
        save = str(tmp_path / f"w{workers}")
        got = evaluate_wo_velocity(songs, runner, reconstruction=True,
                                   host_workers=workers, save_path=save)
        assert set(got) == set(base)
        for k in base:
            assert got[k] == base[k], (k, workers)
        files = os.listdir(save)
        assert sum(f.endswith(".pred.mid") for f in files) == 6
