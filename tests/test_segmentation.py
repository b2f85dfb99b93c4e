"""Semantic_Segmentation parity vs the reference torch model."""
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models.segmentation import (MultiHeadAttention2D,
                                              SemanticSegmentation,
                                              tf_same_pad)
from reconvat_tpu.train.torch_convert import torch_to_flax

from . import reference_oracle


def test_tf_same_pad_matches_reference():
    torch = pytest.importorskip("torch")
    seg = reference_oracle.reference_module("Segmentation")
    x = np.random.RandomState(0).randn(1, 13, 29, 3).astype(np.float32)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    for ksize, stride in [((3, 3), (2, 2)), ((3, 3), (1, 1)),
                          ((7, 7), (1, 1)), ((1, 1), (2, 2))]:
        ref = seg.SAME_padding(xt, ksize, stride).numpy()
        got = np.transpose(np.asarray(
            tf_same_pad(jnp.asarray(x), ksize, stride)), (0, 3, 1, 2))
        np.testing.assert_array_equal(got, ref)


def test_attention2d_matches_reference():
    torch = pytest.importorskip("torch")
    seg = reference_oracle.reference_module("Segmentation")
    torch.manual_seed(0)
    ref = seg.MutliHeadAttention2D(16, 8, kernel_size=(5, 5), groups=1).eval()
    x = np.random.RandomState(1).randn(2, 6, 9, 16).astype(np.float32)
    with torch.no_grad():
        out_ref, attn_ref = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    mod = MultiHeadAttention2D(8, (5, 5), groups=1)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted, report = torch_to_flax(ref.state_dict(), v)
    assert not report["skipped"], report["skipped"]
    out, attn = mod.apply(converted, jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               out_ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_segmentation_forward_matches_reference():
    torch = pytest.importorskip("torch")
    seg = reference_oracle.reference_module("Segmentation")
    torch.manual_seed(0)
    ref = seg.Semantic_Segmentation(torch.empty(1, 1, 64, 229), 1,
                                    spec="Mel").eval()
    x = np.random.RandomState(2).rand(1, 64, 229, 1).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    model = SemanticSegmentation(out_class=1)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(ref.state_dict(), f.name)
        converted = model.load_reference_weights(f.name, variables)

    out = model.module.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-2, atol=1e-3)


def test_segmentation_run_on_batch():
    model = SemanticSegmentation(out_class=1)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(1, 64 * 512).astype(np.float32)
                             * 0.1),
        "frame": jnp.asarray((rng.rand(1, 64, 88) > 0.9)
                             .astype(np.float32)),
        "onset": jnp.asarray((rng.rand(1, 64, 88) > 0.97)
                             .astype(np.float32)),
    }
    preds, losses, spec, stats = model.run_on_batch(
        variables, batch, None, jax.random.PRNGKey(1), vat=True, train=True)
    assert preds["frame"].shape == (1, 64, 88)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
