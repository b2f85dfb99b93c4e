"""Thickstun fully-convolutional reformulation parity vs reference unfold."""
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models.thickstun import Thickstun

from . import reference_oracle


@pytest.mark.slow
def test_thickstun_matches_reference_unfold():
    torch = pytest.importorskip("torch")
    tm = reference_oracle.reference_module("Thickstun_model")
    torch.manual_seed(0)
    ref = tm.Thickstun().eval()

    # reference consumes per-frame 229x25 patches built by pad+unfold
    rng = np.random.RandomState(0)
    spec = rng.rand(2, 48, 229).astype(np.float32)  # our (B, T, F)
    spec_ref = np.transpose(spec, (0, 2, 1))        # reference (B, F, T)
    with torch.no_grad():
        sp = torch.nn.functional.pad(torch.tensor(spec_ref), (12, 12))
        sp = sp.unfold(2, 25, 1).transpose(1, 2).reshape(-1, 229, 25)
        out_ref = ref(sp).numpy().reshape(2, 48, 88)

    model = Thickstun()
    variables = model.init(jax.random.PRNGKey(0), seq_frames=48)
    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(ref.state_dict(), f.name)
        variables = model.load_reference_weights(f.name, variables)

    out = model.module.apply(variables, jnp.asarray(spec), train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref,
                               rtol=1e-3, atol=1e-4)


def test_thickstun_run_on_batch():
    model = Thickstun()
    variables = model.init(jax.random.PRNGKey(0), seq_frames=32)
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(1, 32 * 512).astype(np.float32)
                             * 0.1),
        "frame": jnp.asarray((rng.rand(1, 32, 88) > 0.9)
                             .astype(np.float32)),
        "onset": jnp.asarray((rng.rand(1, 32, 88) > 0.97)
                             .astype(np.float32)),
    }
    preds, losses, spec, _ = model.run_on_batch(variables, batch)
    assert preds["frame"].shape == (1, 32, 88)
    assert np.isfinite(float(losses["loss/train_frame"]))
