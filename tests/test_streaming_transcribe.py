"""Streaming (bounded-memory) transcription vs the full-song path.

The haloed-window path must reproduce the one-shot transcription
everywhere the halo covers the transcriber's receptive field — including
the normalization, whose imagewise statistics are song-global. Reference
context: `model/self_attention_VAT.py:1293-1314` transcribes full songs
in one eager forward (unbounded memory).
"""
import jax
import numpy as np
import pytest

from reconvat_tpu import constants as C
from reconvat_tpu.models.reconvat import ReconVAT


def _song(seconds, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * C.SAMPLE_RATE)) / C.SAMPLE_RATE
    sig = sum(0.2 * np.sin(2 * np.pi * f * t + rng.rand())
              for f in (220.0, 440.0, 523.25, 660.0))
    sig = sig * (0.5 + 0.5 * np.sin(2 * np.pi * 0.3 * t))  # slow envelope
    return (sig + 0.01 * rng.randn(len(t))).astype(np.float32)[None]


@pytest.mark.parametrize("mode", ["imagewise", "framewise"])
def test_streaming_matches_full_song(mode):
    model = ReconVAT(reconstruction=True, mode=mode, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    audio = _song(48.0)  # 1500 frames -> 3 windows at W=512

    full = np.asarray(model.transcribe(variables, audio)["frame"],
                      np.float32)
    streamed = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128)["frame"], np.float32)
    assert streamed.shape == full.shape
    # the last window pads past the song end exactly like the bucketed
    # eval path, so the final receptive-field frames carry the bucketed
    # path's (documented) end-halo wiggle vs the exact baseline
    np.testing.assert_allclose(streamed[:, :-64], full[:, :-64], atol=1e-5)
    np.testing.assert_allclose(streamed[:, -64:], full[:, -64:], atol=1e-3)


def test_streaming_short_clip_falls_back():
    model = ReconVAT(reconstruction=True, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    audio = _song(6.0, seed=1)  # 188 frames < one window span
    full = np.asarray(model.transcribe(variables, audio)["frame"],
                      np.float32)
    streamed = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128)["frame"], np.float32)
    assert streamed.shape == full.shape
    # bucket padding's end-halo wiggle only (same as the bucketed path;
    # measured: 4/16544 elements to 2.4e-4 in the clip's last frames)
    np.testing.assert_allclose(streamed, full, atol=1e-3)


def test_streaming_batch_imagewise_stats_per_element():
    """imagewise statistics are per batch element — two songs with very
    different levels must each match their own full-song run."""
    model = ReconVAT(reconstruction=True, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    a = _song(48.0, seed=2)
    b = 0.05 * _song(48.0, seed=3)   # 26 dB quieter
    audio = np.concatenate([a, b], axis=0)
    full = np.asarray(model.transcribe(variables, audio)["frame"],
                      np.float32)
    streamed = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128)["frame"], np.float32)
    np.testing.assert_allclose(streamed[:, :-64], full[:, :-64], atol=1e-5)
    np.testing.assert_allclose(streamed[:, -64:], full[:, -64:], atol=1e-3)


def test_streaming_unet_onset_dict_outputs():
    """UNetOnset's streaming path returns the {frame, onset} dict and
    matches its one-shot transcribe."""
    from reconvat_tpu.models.unet_onset import UNetOnset

    model = UNetOnset(reconstruction=True, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    audio = _song(48.0, seed=4)
    # baseline = the bucketed (production eval) path: identical end-pad
    # semantics, so the comparison is sharp through the final frames
    # (vs the exact path both share the documented end-halo wiggle,
    # which for UNetOnset's deeper head reaches ~5e-2)
    full = model.transcribe(variables, audio, bucket_frames=512)
    streamed = model.transcribe_streaming(variables, audio,
                                          window_frames=512,
                                          halo_frames=128)
    for k in ("frame", "onset"):
        s = np.asarray(streamed[k], np.float32)
        f = np.asarray(full[k], np.float32)
        np.testing.assert_allclose(s[:, :-64], f[:, :-64], atol=1e-5,
                                   err_msg=k)
        np.testing.assert_allclose(s[:, -64:], f[:, -64:], atol=1e-3,
                                   err_msg=k)


def test_streaming_segmentation():
    """Segmentation's streaming path (larger halo: two 17x17 attention
    layers at the /16 bottleneck) vs its bucketed transcribe."""
    from reconvat_tpu.models.segmentation import SemanticSegmentation

    model = SemanticSegmentation(out_class=1)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    audio = _song(48.0, seed=5)   # 1500 frames, span 1152 -> 3 windows
    full = model.transcribe(variables, audio, bucket_frames=512)
    streamed = model.transcribe_streaming(variables, audio,
                                          window_frames=640,
                                          halo_frames=256)
    s = np.asarray(streamed["frame"], np.float32)
    f = np.asarray(full["frame"], np.float32)
    # measured: worst interior diff 2.6e-5 on 0.03% of elements (fp32
    # reduction noise through the 15-BN pre-activation cascade)
    np.testing.assert_allclose(s[:, :-64], f[:, :-64], atol=1e-4)
    np.testing.assert_allclose(s[:, -64:], f[:, -64:], atol=1e-3)


def test_streaming_segmentation_multi_instrument():
    """out_class > 1 rolls are (B, out_class, T, 88) — time behind the
    channel axis (the reference's no-op squeeze(1),
    `model/Segmentation.py:531`). The bucketed trim and the streaming
    stitcher must slice the TIME axis, not the channel axis."""
    from reconvat_tpu.models.segmentation import SemanticSegmentation

    model = SemanticSegmentation(out_class=2)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)

    # short clip: bucketed trim + the streaming short-clip fallback
    short = _song(10.0, seed=7)                      # 313 frames
    t_true = (short.shape[1] - 1) // C.HOP_LENGTH + 1
    exact = np.asarray(model.transcribe(variables, short)["frame"],
                       np.float32)
    assert exact.shape == (1, 2, t_true, 88)
    bucketed = np.asarray(
        model.transcribe(variables, short, bucket_frames=512)["frame"],
        np.float32)
    assert bucketed.shape == (1, 2, t_true, 88)
    # the bottleneck attention sees the pad frames, so bucketed-vs-exact
    # carries a small global wiggle that grows with the pad length
    # (313 -> 512 here); axis errors would fail the shape asserts or
    # produce O(1) diffs
    np.testing.assert_allclose(bucketed[:, :, :-64], exact[:, :, :-64],
                               atol=2e-3)
    fallback = np.asarray(
        model.transcribe_streaming(variables, short)["frame"], np.float32)
    assert fallback.shape == (1, 2, t_true, 88)
    np.testing.assert_allclose(fallback, bucketed, atol=2e-3)

    # long song: multi-window stitch along the true time axis
    audio = _song(40.0, seed=8)                      # 1250 frames, 2 windows
    t_long = (audio.shape[1] - 1) // C.HOP_LENGTH + 1
    full = np.asarray(
        model.transcribe(variables, audio, bucket_frames=512)["frame"],
        np.float32)
    streamed = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=640,
                                   halo_frames=256)["frame"], np.float32)
    assert streamed.shape == (1, 2, t_long, 88) == full.shape
    np.testing.assert_allclose(streamed[:, :, :-64], full[:, :, :-64],
                               atol=2e-3)
    np.testing.assert_allclose(streamed[:, :, -64:], full[:, :, -64:],
                               atol=5e-3)


def test_streaming_jit_cache_reused_across_songs():
    """A directory of recordings must compile the window forward once:
    the jitted callables live on the model instance, keyed by the
    wrapper's forward code object (models/common.transcribe_streaming)."""
    model = ReconVAT(reconstruction=True, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)

    model.transcribe_streaming(variables, _song(30.0, seed=2),
                               window_frames=512, halo_frames=128)
    cache = model._streaming_jit_cache
    window_keys = [k for k in cache if k[0] == "window"]
    assert len(window_keys) == 1 and "spec_chunk" in cache
    jitted = cache[window_keys[0]]

    # second song, same shapes: same jitted wrapper object, no new entries
    model.transcribe_streaming(variables, _song(30.0, seed=3),
                               window_frames=512, halo_frames=128)
    assert cache[window_keys[0]] is jitted
    assert [k for k in cache if k[0] == "window"] == window_keys

    # short clip routes through a cached jitted fallback too
    model.transcribe_streaming(variables, _song(6.0, seed=4),
                               window_frames=512, halo_frames=128)
    assert any(k[0] == "short" for k in cache)


def test_streaming_window_batching_matches_per_window():
    """windows_per_batch=G stacks G same-shape windows per forward; the
    per-window math is unchanged, so outputs match the G=1 path
    (including the duplicated-padding tail group)."""
    model = ReconVAT(reconstruction=True, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    audio = _song(64.0, seed=5)  # 2000 frames -> 4 windows at W=512

    one = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128)["frame"], np.float32)
    grouped = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128,
                                   windows_per_batch=3)["frame"], np.float32)
    assert grouped.shape == one.shape
    np.testing.assert_allclose(grouped, one, atol=1e-5)


def test_streaming_mesh_sharded_windows_match():
    """mesh_ctx shards the stacked window axis over the mesh batch axis:
    multi-chip serving of one long recording, same numbers."""
    from reconvat_tpu.parallel.mesh import MeshContext, make_mesh

    model = ReconVAT(reconstruction=True, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    audio = _song(64.0, seed=6)  # 4 windows at W=512

    base = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128)["frame"], np.float32)
    ctx = MeshContext(make_mesh(8, dp=4, sp=2))
    sharded = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128, windows_per_batch=4,
                                   mesh_ctx=ctx)["frame"], np.float32)
    assert sharded.shape == base.shape
    np.testing.assert_allclose(sharded, base, atol=1e-5)


def test_streaming_pipeline_depth_identical():
    """pipeline_depth only changes host scheduling (how many window
    forwards are in flight), never the math: depth 1 == depth 3 exactly,
    including the windows_per_batch grouping."""
    model = ReconVAT(reconstruction=True, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=256)
    audio = _song(64.0, seed=7)  # 4 windows at W=512

    d1 = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128,
                                   pipeline_depth=1)["frame"], np.float32)
    d3 = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128,
                                   pipeline_depth=3)["frame"], np.float32)
    np.testing.assert_array_equal(d1, d3)
    g3 = np.asarray(
        model.transcribe_streaming(variables, audio, window_frames=512,
                                   halo_frames=128, windows_per_batch=2,
                                   pipeline_depth=3)["frame"], np.float32)
    np.testing.assert_allclose(g3, d1, atol=1e-5)
