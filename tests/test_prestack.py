"""Prestack (U-Net + ResNet-18) smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models.prestack import Prestack, ResNet18


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
