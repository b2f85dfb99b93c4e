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
