"""Prestack (U-Net + ResNet-18) smoke + reference-parity tests."""
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models.prestack import Prestack, ResNet18

from . import reference_oracle


def test_resnet18_shapes_and_param_count():
    mod = ResNet18(88)
    x = jnp.zeros((2, 229, 25, 1))
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    out = mod.apply(v, x, train=False)
    assert out.shape == (2, 88)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(v["params"]))
    # torchvision resnet18 has 11.69M params with 1000 classes;
    # with conv1 1-channel and fc->88: 11176512 - 9408 + 192 -
    # (512000+1000) + (512*88+88) = ~11.2M
    assert 10_500_000 < n < 11_500_000, n


@pytest.mark.slow
def test_prestack_run_on_batch_matches_reference():
    """Full run_on_batch parity vs the actual reference `Prestack_Model`
    (`model/Unet_prestack.py:129-176`): mel -> log -> imagewise norm ->
    229x25 patch unfold -> U-Net prestack -> ResNet-18 -> sigmoid -> BCE.
    The reference loops patches one by one; ours batches them — outputs
    must agree elementwise."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    ref = reference_oracle.reference_prestack_model()
    # randomize BN running stats so eval-mode BN is a real transform
    # (and their conversion is actually exercised)
    rng = np.random.RandomState(42)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.tensor(
                    rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.tensor(
                    (0.5 + rng.rand(m.num_features)).astype(np.float32)))
    ref.eval()

    frames = 6
    audio = (rng.randn(1, frames * 512) * 0.1).astype(np.float32)
    frame = (rng.rand(1, frames, 88) > 0.9).astype(np.float32)
    with torch.no_grad():
        preds_ref, losses_ref, _ = ref.run_on_batch(
            {"audio": torch.tensor(audio), "onset": torch.tensor(frame),
             "frame": torch.tensor(frame)})

    model = Prestack()
    variables = model.init(jax.random.PRNGKey(0))
    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(ref.state_dict(), f.name)
        converted = model.load_reference_weights(f.name, variables)

    preds, losses, _, _ = model.run_on_batch(
        converted, {"audio": jnp.asarray(audio), "frame": jnp.asarray(frame),
                    "onset": jnp.asarray(frame)}, train=False)
    np.testing.assert_allclose(
        np.asarray(preds["frame"]).reshape(-1, 88),
        preds_ref["frame"].numpy(), rtol=1e-3, atol=2e-4)
    assert abs(float(losses["loss/train_frame"])
               - float(losses_ref["loss/train_frame"])) < 1e-4


@pytest.mark.slow
def test_prestack_run_on_batch():
    model = Prestack()
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = 8
    batch = {
        "audio": jnp.asarray(rng.randn(1, frames * 512).astype(np.float32)
                             * 0.1),
        "frame": jnp.asarray((rng.rand(1, frames, 88) > 0.9)
                             .astype(np.float32)),
        "onset": jnp.asarray((rng.rand(1, frames, 88) > 0.97)
                             .astype(np.float32)),
    }
    preds, losses, spec, stats = model.run_on_batch(
        variables, batch, None, jax.random.PRNGKey(1), train=True)
    assert preds["frame"].shape == (1, frames, 88)
    assert np.isfinite(float(losses["loss/train_frame"]))
    assert stats is not None
