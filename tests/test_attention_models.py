"""Smoke + parity tests for the secondary attention model family."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models import attention_models as am

from . import reference_oracle


def _batch(frames=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "audio": jnp.asarray(rng.randn(2, frames * 512).astype(np.float32)
                             * 0.1),
        "frame": jnp.asarray((rng.rand(2, frames, 88) > 0.9)
                             .astype(np.float32)),
        "onset": jnp.asarray((rng.rand(2, frames, 88) > 0.97)
                             .astype(np.float32)),
    }


@pytest.mark.parametrize("cls,kwargs", [
    (am.VATSelfAttention1D, {}),
    (am.VATCNNAttention1D, {"version": "a"}),
    (am.VATCNNAttention1D, {"version": "b"}),
    (am.VATCNNAttentionOnsetFrame, {"model_complexity": 48}),
    (am.OnsetsAndFramesSelfAttention, {"model_complexity": 8}),
    (am.SimpleOnsetFrame, {}),
    (am.StandaloneSelfAttention1D, {"layernorm_pos": "Before"}),
    (am.StandaloneSelfAttention1D, {"layernorm_pos": "After"}),
    (am.StandaloneSelfAttention2D, {"model_complexity": 4}),
])
def test_secondary_models_run(cls, kwargs):
    model = cls(**kwargs)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=32)
    batch = _batch()
    vat = hasattr(model, "vat_cfg")
    preds, losses, spec, _ = model.run_on_batch(
        variables, batch, batch if vat else None, jax.random.PRNGKey(1),
        vat=vat, train=True)
    assert preds["frame"].shape == (2, 32, 88)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (cls.__name__, k, float(v))


def test_reconstructor_runs():
    model = am.Reconstructor()
    variables = model.init(jax.random.PRNGKey(0), seq_frames=32)
    batch = _batch()
    preds, losses, spec, stats = model.run_on_batch(variables, batch)
    assert preds["reconstruction"].shape[:3] == (2, 32, 229)
    assert np.isfinite(float(losses["loss/train_reconstruction"]))


def test_triangular_cycle_matches_reference():
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    ref_cycle = sav.create_triangular_cycle(0.1, 1.0, 5)
    got_cycle = am.create_triangular_cycle(0.1, 1.0, 5)
    for _ in range(20):
        np.testing.assert_allclose(float(next(got_cycle)),
                                   float(next(ref_cycle)), rtol=1e-6)


def test_standalone_attention_matches_reference():
    """Full-model parity for one representative secondary model."""
    torch = pytest.importorskip("torch")
    sam = reference_oracle.reference_module("self_attenttion_model")
    torch.manual_seed(0)
    ref = sam.standalone_self_attention_1D(
        229, 88, model_complexity=48, w_size=7, n_heads=8,
        layernorm_pos="Before").eval()
    x = np.random.RandomState(1).rand(1, 20, 229).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = ref(torch.tensor(x))

    from reconvat_tpu.train.torch_convert import torch_to_flax

    model = am.StandaloneSelfAttention1D(model_complexity=48, w_size=7,
                                         n_heads=8, layernorm_pos="Before")
    variables = model.init(jax.random.PRNGKey(0), seq_frames=20)
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith(("spectrogram.", "normalize."))}
    converted, report = torch_to_flax(sd, variables)
    assert not report["skipped"], report["skipped"]
    out, _ = model.module.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def _convert(ref, model, x, renames=()):
    """Reference state_dict -> our tree; renames fix nn.Sequential's
    numeric indices (same pattern as test_onsets_frames)."""
    from reconvat_tpu.train.torch_convert import torch_to_flax

    variables = model.init(jax.random.PRNGKey(0), seq_frames=x.shape[1])
    sd = {}
    for k, p in ref.state_dict().items():
        for a, b in renames:
            k = k.replace(a, b)
        if not k.startswith(("spectrogram.", "normalize.", "vat_loss.")):
            sd[k] = p
    converted, report = torch_to_flax(sd, variables)
    assert not report["skipped"], report["skipped"]
    return converted


_CONVSTACK_RENAMES = (
    ("cnn.cnn.0.", "cnn.conv0."), ("cnn.cnn.1.", "cnn.bn0."),
    ("cnn.cnn.3.", "cnn.conv1."), ("cnn.cnn.4.", "cnn.bn1."),
    ("cnn.cnn.8.", "cnn.conv2."), ("cnn.cnn.9.", "cnn.bn2."),
    ("cnn.fc.0.", "cnn.fc."),
)
_TIMBRAL_RENAMES = (
    ("cnn.0.", "conv0."), ("cnn.1.", "bn0."),
    ("cnn.3.", "conv1."), ("cnn.4.", "bn1."),
    ("cnn.7.", "conv2."), ("cnn.8.", "bn2."),
    ("fc.0.", "fc."),
)


def test_vat_self_attention_1d_matches_reference():
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    torch.manual_seed(0)
    ref = sav.VAT_self_attention_1D(229, 88, model_complexity=48,
                                    w_size=7, n_heads=8).eval()
    x = np.random.RandomState(1).rand(1, 20, 229).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = ref(torch.tensor(x))
    model = am.VATSelfAttention1D(model_complexity=48, w_size=7, n_heads=8)
    out, _ = model.module.apply(_convert(ref, model, x), jnp.asarray(x),
                                train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("version", ["a", "b"])
def test_vat_cnn_attention_1d_matches_reference(version):
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    torch.manual_seed(0)
    ref = sav.VAT_CNN_attention_1D(229, 88, model_complexity=48, w_size=7,
                                   n_heads=8, version=version).eval()
    x = np.random.RandomState(1).rand(1, 20, 229).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = ref(torch.tensor(x))
    model = am.VATCNNAttention1D(model_complexity=48, w_size=7, n_heads=8,
                                 version=version)
    renames = (_CONVSTACK_RENAMES if version == "a"
               else tuple(("cnn." + a, "cnn." + b)
                          for a, b in _TIMBRAL_RENAMES))
    out, _ = model.module.apply(_convert(ref, model, x, renames),
                                jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_simple_onset_frame_matches_reference():
    torch = pytest.importorskip("torch")
    sam = reference_oracle.reference_module("self_attenttion_model")
    torch.manual_seed(0)
    ref = sam.simple_onset_frame(229, 88, model_complexity=48, w_size=7,
                                 n_heads=8).eval()
    x = np.random.RandomState(1).rand(1, 20, 229).astype(np.float32)
    with torch.no_grad():
        frame_ref, onset_ref, _ = ref(torch.tensor(x))
    model = am.SimpleOnsetFrame(model_complexity=48, w_size=7, n_heads=8)
    frame, onset, _ = model.module.apply(_convert(ref, model, x),
                                         jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(frame), frame_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(onset), onset_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_cnn_attention_onset_frame_matches_reference():
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    torch.manual_seed(0)
    ref = sav.VAT_CNN_attention_onset_frame(229, 88, model_complexity=48,
                                            w_size=7, n_heads=8).eval()
    x = np.random.RandomState(1).rand(1, 20, 229).astype(np.float32)
    with torch.no_grad():
        frame_ref, onset_ref, _ = ref(torch.tensor(x))
    model = am.VATCNNAttentionOnsetFrame(model_complexity=48, w_size=7,
                                         n_heads=8)
    renames = tuple((p + a, p + b) for p in ("cnn.", "onset_timbral_cnn.")
                    for a, b in _TIMBRAL_RENAMES)
    frame, onset, _ = model.module.apply(_convert(ref, model, x, renames),
                                         jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(frame), frame_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(onset), onset_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_onsets_frames_self_attention_matches_reference():
    torch = pytest.importorskip("torch")
    sam = reference_oracle.reference_module("self_attenttion_model")
    torch.manual_seed(0)
    ref = sam.OnsetsAndFrames_self_attention(
        229, 88, model_complexity=8, w_size=7,
        attention_mode="activation", onset_stack=True).eval()
    x = np.random.RandomState(1).rand(1, 20, 229).astype(np.float32)
    with torch.no_grad():
        onset_ref, act_ref, frame_ref, _ = ref(torch.tensor(x))
    model = am.OnsetsAndFramesSelfAttention(model_complexity=8, w_size=7)
    renames = (
        ("onset_stack.convstack.cnn.0.", "onset_conv.conv0."),
        ("onset_stack.convstack.cnn.1.", "onset_conv.bn0."),
        ("onset_stack.convstack.cnn.3.", "onset_conv.conv1."),
        ("onset_stack.convstack.cnn.4.", "onset_conv.bn1."),
        ("onset_stack.convstack.cnn.8.", "onset_conv.conv2."),
        ("onset_stack.convstack.cnn.9.", "onset_conv.bn2."),
        ("onset_stack.convstack.fc.0.", "onset_conv.fc."),
        ("onset_stack.sequence_model.", "onset_attn."),
        ("onset_stack.linear.", "onset_linear."),
        ("frame_stack.0.cnn.0.", "frame_conv.conv0."),
        ("frame_stack.0.cnn.1.", "frame_conv.bn0."),
        ("frame_stack.0.cnn.3.", "frame_conv.conv1."),
        ("frame_stack.0.cnn.4.", "frame_conv.bn1."),
        ("frame_stack.0.cnn.8.", "frame_conv.conv2."),
        ("frame_stack.0.cnn.9.", "frame_conv.bn2."),
        ("frame_stack.0.fc.0.", "frame_conv.fc."),
        ("frame_stack.1.", "frame_linear."),
        ("combined_stack.sequence_model.", "combined_attn."),
        ("combined_stack.linear.", "combined_linear."),
    )
    onset, act, frame, _ = model.module.apply(
        _convert(ref, model, x, renames), jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(onset), onset_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(act), act_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(frame), frame_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_standalone_attention_2d_matches_reference():
    torch = pytest.importorskip("torch")
    sam = reference_oracle.reference_module("self_attenttion_model")
    torch.manual_seed(0)
    ref = sam.standalone_self_attention_2D(1, 88, model_complexity=4,
                                           w_size=(3, 3)).eval()
    x = np.random.RandomState(1).rand(1, 16, 229).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = ref(torch.tensor(x))
    model = am.StandaloneSelfAttention2D(model_complexity=4)
    out, _ = model.module.apply(_convert(ref, model, x), jnp.asarray(x),
                                train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
