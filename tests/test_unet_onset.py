"""UNet_Onset full-model parity vs the reference."""
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models.unet_onset import UNetOnset

from . import reference_oracle


@pytest.mark.slow
def test_unet_onset_forward_matches_reference():
    torch = pytest.importorskip("torch")
    uo = reference_oracle.reference_module("UNet_onset")
    torch.manual_seed(0)
    ref = uo.UNet_Onset((2, 2), (2, 2), log=True, reconstruction=True,
                        mode="imagewise", spec="Mel").eval()
    x = np.random.RandomState(0).rand(1, 64, 229, 1).astype(np.float32)
    with torch.no_grad():
        rec_ref, roll_ref, onset_ref, roll2_ref, onset2_ref, a_ref = ref(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    model = UNetOnset(reconstruction=True)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(ref.state_dict(), f.name)
        converted = model.load_reference_weights(f.name, variables)

    rec, roll, onset, roll2, onset2, a = model.module.apply(
        converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(roll), roll_ref.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(onset), onset_ref.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rec)[..., 0],
                               rec_ref.numpy()[:, 0], rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(roll2), roll2_ref.numpy(),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(onset2), onset2_ref.numpy(),
                               rtol=1e-2, atol=1e-3)


def test_unet_onset_run_on_batch_keys():
    model = UNetOnset(reconstruction=True)
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
    preds, losses, spec, stats = model.run_on_batch(
        variables, batch, batch, jax.random.PRNGKey(1), vat=True,
        train=True)
    expect = {"loss/train_reconstruction", "loss/train_frame",
              "loss/train_frame2", "loss/train_onset", "loss/train_onset2",
              "loss/train_LDS_l_frame", "loss/train_LDS_l_onset",
              "loss/train_LDS_ul_frame", "loss/train_LDS_ul_onset",
              "loss/train_r_norm_l", "loss/train_r_norm_ul"}
    assert expect == set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
