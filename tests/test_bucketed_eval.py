"""Bucketed (jitted, padded+masked) full-song evaluation vs the exact path.

The reference evaluates full songs eagerly at exact shapes
(`model/helper_functions.py:65`); our bucketed path must reproduce its
numbers: losses masked to the true frames, predictions identical away from
the receptive-field halo at the clip end, and only a handful of compiled
shapes for a whole corpus.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.evaluate import make_bucketed_runner
from reconvat_tpu.models.common import frames_in, next_bucket
from reconvat_tpu.models.losses import (binary_cross_entropy, mse_loss)
from reconvat_tpu.ops.normalize import normalize_imagewise

# frames the padding may perturb at the clip end (window-31 attention halo
# + U-Net / conv receptive field)
HALO = 64


def _song(frames, seed=0, extra_samples=17):
    rng = np.random.RandomState(seed)
    # odd audio length: frames_in() must still map it into the same bucket
    n = (frames - 1) * 512 + 1 + extra_samples
    return {
        "path": f"song{seed}.flac",
        "audio": (rng.randn(n) * 0.1).astype(np.float32),
        "frame": (rng.rand(frames, 88) > 0.9).astype(np.float32),
        "onset": (rng.rand(frames, 88) > 0.97).astype(np.float32),
    }


def _exact(model, variables, item):
    batch = {k: (np.asarray(v)[None] if k != "path" else v)
             for k, v in item.items()}
    p, l, s, _ = model.run_on_batch(variables, batch, None,
                                    jax.random.PRNGKey(0), vat=False,
                                    train=False)
    return p, l, s


def _model_cases():
    from reconvat_tpu.models.onsets_frames import OnsetsAndFrames
    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.models.segmentation import SemanticSegmentation
    from reconvat_tpu.models.thickstun import Thickstun
    from reconvat_tpu.models.unet_onset import UNetOnset

    return [
        ("ReconVAT", lambda: ReconVAT(reconstruction=True)),
        ("UNetOnset", lambda: UNetOnset(reconstruction=True)),
        ("OnsetsAndFrames", lambda: OnsetsAndFrames(model_complexity=8)),
        ("Segmentation", lambda: SemanticSegmentation()),
        ("Thickstun", lambda: Thickstun()),
    ]


@pytest.mark.parametrize("name,make", _model_cases(),
                         ids=[c[0] for c in _model_cases()])
@pytest.mark.slow
def test_bucketed_matches_exact(name, make):
    model = make()
    frames = 100
    variables = model.init(jax.random.PRNGKey(0), seq_frames=frames)
    item = _song(frames, seed=3)

    p_exact, l_exact, s_exact = _exact(model, variables, item)
    runner = make_bucketed_runner(model, variables, buckets=(128, 256))
    p_bkt, l_bkt, s_bkt = runner(item)

    assert len(runner.cache) == 1

    # predictions trimmed to the true frame count
    assert p_bkt["frame"].shape == p_exact["frame"].shape
    # identical away from the end halo
    np.testing.assert_allclose(
        np.asarray(p_bkt["frame"])[:, :frames - HALO],
        np.asarray(p_exact["frame"])[:, :frames - HALO],
        atol=5e-4)
    # spec normalization statistics masked to true frames -> spec exact
    np.testing.assert_allclose(np.asarray(s_bkt), np.asarray(s_exact),
                               atol=1e-5)
    # masked losses match the exact-shape losses (boundary-halo wiggle only)
    assert set(l_bkt) == set(l_exact)
    for k in l_exact:
        np.testing.assert_allclose(float(l_bkt[k]), float(l_exact[k]),
                                   atol=5e-3, err_msg=k)


def test_compile_cache_is_bounded():
    from reconvat_tpu.models.thickstun import Thickstun

    model = Thickstun()
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    runner = make_bucketed_runner(model, variables, buckets=(64, 128, 256))
    for frames in (30, 50, 62, 65, 100, 126, 180, 200, 250):
        p, _, _ = runner(_song(frames, seed=frames))
        assert p["frame"].shape[1] == frames
    # 9 different song lengths, at most 3 compiled shapes
    assert set(runner.cache) <= {64, 128, 256}


def test_ladder_extends_beyond_last_bucket():
    assert next_bucket(100, (64, 128)) == 128
    assert next_bucket(129, (64, 128)) == 256
    assert next_bucket(513, (64, 128)) == 1024
    assert frames_in(327680) == 640


def test_masked_losses_equal_trimmed():
    rng = np.random.RandomState(0)
    t_true, t_pad = 37, 64
    pred = jnp.asarray(rng.rand(2, t_pad, 88).astype(np.float32))
    target = jnp.asarray((rng.rand(2, t_pad, 88) > 0.9).astype(np.float32))
    mask = jnp.arange(t_pad) < t_true
    np.testing.assert_allclose(
        float(binary_cross_entropy(pred, target, mask)),
        float(binary_cross_entropy(pred[:, :t_true], target[:, :t_true])),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(mse_loss(pred, target, mask)),
        float(mse_loss(pred[:, :t_true], target[:, :t_true])), rtol=1e-6)


def test_masked_imagewise_normalize_equals_trimmed():
    rng = np.random.RandomState(1)
    t_true, t_pad = 41, 64
    x = jnp.asarray(rng.randn(2, t_pad, 229).astype(np.float32))
    mask = jnp.arange(t_pad) < t_true
    out = normalize_imagewise(x, mask)
    ref = normalize_imagewise(x[:, :t_true])
    np.testing.assert_allclose(np.asarray(out)[:, :t_true], np.asarray(ref),
                               atol=1e-6)


@pytest.mark.slow
def test_transcribe_bucketing_all_models():
    """Every model family supports transcribe(..., bucket_frames=...)."""
    from reconvat_tpu.models.onsets_frames import OnsetsAndFrames
    from reconvat_tpu.models.prestack import Prestack
    from reconvat_tpu.models.segmentation import SemanticSegmentation
    from reconvat_tpu.models.thickstun import Thickstun
    from reconvat_tpu.models.unet_onset import UNetOnset

    frames = 72
    rng = np.random.RandomState(0)
    audio = (rng.randn(1, (frames - 1) * 512 + 9) * 0.1).astype(np.float32)

    for make in (lambda: UNetOnset(reconstruction=False),
                 lambda: OnsetsAndFrames(model_complexity=8),
                 lambda: SemanticSegmentation(),
                 lambda: Thickstun(),
                 lambda: Prestack()):
        model = make()
        variables = model.init(jax.random.PRNGKey(0), seq_frames=frames)
        exact = model.transcribe(variables, jnp.asarray(audio))
        bkt = model.transcribe(variables, jnp.asarray(audio),
                               bucket_frames=128)
        assert bkt["frame"].shape == exact["frame"].shape
        np.testing.assert_allclose(
            np.asarray(bkt["frame"])[:, :frames - HALO],
            np.asarray(exact["frame"])[:, :frames - HALO], atol=5e-4,
            err_msg=type(model).__name__)


@pytest.mark.slow
def test_grouped_eval_matches_per_song():
    """batch_songs=G (vmapped same-bucket groups) reproduces the per-song
    path: same metric keys, same values, corpus order preserved — across
    two buckets and a non-full tail group."""
    from reconvat_tpu.evaluate import evaluate_wo_velocity
    from reconvat_tpu.models.reconvat import ReconVAT

    model = ReconVAT(reconstruction=True)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    runner = make_bucketed_runner(model, variables, buckets=(64, 128))
    # 5 songs: buckets 64,128 interleaved; group of 2 leaves a tail of 1
    songs = [_song(f, seed=f) for f in (40, 100, 44, 104, 48)]

    ref = evaluate_wo_velocity(songs, runner, reconstruction=True,
                               pipeline=0)
    got = evaluate_wo_velocity(songs, runner, reconstruction=True,
                               pipeline=1, batch_songs=2)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    # grouped compiles: one vmapped executable per (bucket, G)
    assert ("group", 64, 2) in runner.cache
    assert ("group", 128, 2) in runner.cache


def test_grouped_eval_without_bucketing_support_falls_back():
    """batch_songs>1 with a model lacking t_true support (all attention
    families) must fall back to the exact per-song path instead of
    crashing (round-4 advisor: run_group returned [] for multi-song
    groups -> KeyError in evaluate_wo_velocity)."""
    from reconvat_tpu.evaluate import evaluate_wo_velocity
    from reconvat_tpu.models import attention_models as am

    model = am.SimpleOnsetFrame(model_complexity=16, w_size=7, n_heads=4)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=48)
    runner = make_bucketed_runner(model, variables)
    assert hasattr(runner, "run_group")
    songs = [_song(48, seed=s, extra_samples=0) for s in (1, 2, 3)]

    ref = evaluate_wo_velocity(songs, runner, reconstruction=False,
                               pipeline=0)
    got = evaluate_wo_velocity(songs, runner, reconstruction=False,
                               pipeline=1, batch_songs=2)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
