"""Full ReconVAT model parity & training-contract tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu import vat as vat_mod
from reconvat_tpu.models.reconvat import ReconVAT, UNet
from reconvat_tpu.train.torch_convert import torch_to_flax

from . import reference_oracle

SKIP_PREFIXES = ("spectrogram.", "normalize.", "vat_loss.")


def _filtered(report):
    return [k for k in report["skipped"] if not k.startswith(SKIP_PREFIXES)]


def _build_reference_unet(reconstruction=True):
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    torch.manual_seed(0)
    ref = sav.UNet((2, 2), (2, 2), log=True, reconstruction=reconstruction,
                   mode="imagewise", spec="Mel")
    return ref.eval()


@pytest.mark.parametrize("conv_layout", ["nhwc", "folded"])
def test_unet_forward_matches_reference(conv_layout):
    """Full-forward parity against the live reference torch UNet with
    converted weights, in both U-Net computation layouts — 'folded' is
    the production TPU layout (nn/unet.resolve_conv_layout), so it gets
    the same direct torch oracle, not just transitivity through nhwc."""
    torch = pytest.importorskip("torch")
    ref = _build_reference_unet()
    x = np.random.RandomState(0).rand(1, 64, 229, 1).astype(np.float32)
    with torch.no_grad():
        rec_ref, roll_ref, roll2_ref, a_ref = ref(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    model = UNet(n_bins=229, reconstruction=True, conv_layout=conv_layout)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    converted, report = torch_to_flax(ref.state_dict(), variables)
    assert not _filtered(report), _filtered(report)

    rec, roll, roll2, a = model.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(roll),
                               roll_ref.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rec)[..., 0],
                               rec_ref.numpy()[:, 0], rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(roll2),
                               roll2_ref.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a),
                               a_ref.numpy(), rtol=1e-3, atol=1e-4)


def test_vat_matches_reference_with_fixed_direction():
    """Run the actual reference UNet_VAT with a pinned random direction and
    compare loss value + r_adv against our jitted VAT transform."""
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    ref = _build_reference_unet()

    rng = np.random.RandomState(7)
    x = rng.rand(1, 64, 229, 1).astype(np.float32)
    d0 = rng.randn(1, 1, 64, 229).astype(np.float32)

    # xi large enough that the fp32 finite-difference gradient is
    # numerically well-conditioned (at the production xi=1e-6 the direction
    # is float-noise-dominated in *both* frameworks — that is what the
    # reference's 1e10 rescue factor is about).
    vat_ref = sav.UNet_VAT(XI=0.1, epsilon=2.0, n_power=1, KL_Div=False)
    orig_randn_like = torch.randn_like

    def fixed_randn_like(t, requires_grad=False):
        out = torch.tensor(d0.copy())
        if requires_grad:
            out.requires_grad_(True)
        return out

    torch.randn_like = fixed_randn_like
    try:
        lds_ref, r_adv_ref, rnorm_ref = vat_ref(ref, torch.tensor(
            np.transpose(x, (0, 3, 1, 2))))
    finally:
        torch.randn_like = orig_randn_like

    model = UNet(n_bins=229, reconstruction=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    converted, _ = torch_to_flax(ref.state_dict(), variables)

    def transcriber_fn(z):
        return model.apply(converted, z, train=False,
                           method=UNet.transcribe_frames)

    cfg = vat_mod.VATConfig(xi=0.1, eps=2.0, n_power=1, norm_axis=2)
    d0_nhwc = jnp.asarray(np.transpose(d0, (0, 2, 3, 1)))
    lds, r_adv, rnorm = vat_mod.vat_loss(
        transcriber_fn, jnp.asarray(x), jax.random.PRNGKey(0), cfg,
        init_d=d0_nhwc)

    np.testing.assert_allclose(float(lds), float(lds_ref), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(r_adv)[..., 0],
                               r_adv_ref.detach().numpy()[:, 0],
                               rtol=2e-2, atol=4e-3)


def _batch(batch=2, frames=64, seed=0):
    rng = np.random.RandomState(seed)
    n = frames * 512
    return {
        "audio": jnp.asarray(rng.randn(batch, n).astype(np.float32) * 0.1),
        "frame": jnp.asarray((rng.rand(batch, frames, 88) > 0.9)
                             .astype(np.float32)),
        "onset": jnp.asarray((rng.rand(batch, frames, 88) > 0.97)
                             .astype(np.float32)),
    }


def test_run_on_batch_contract_and_grads():
    model = ReconVAT()
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    batch_l, batch_ul = _batch(2, 64, 0), _batch(2, 64, 1)

    preds, losses, spec, new_stats = model.run_on_batch(
        variables, batch_l, batch_ul, jax.random.PRNGKey(1),
        vat=True, train=True)
    expect_keys = {"loss/train_reconstruction", "loss/train_frame",
                   "loss/train_frame2", "loss/train_LDS_l",
                   "loss/train_LDS_ul", "loss/train_r_norm_l",
                   "loss/train_r_norm_ul"}
    assert expect_keys == set(losses)
    assert preds["frame"].shape == (2, 64, 88)
    assert spec.shape == (2, 64, 229)
    assert new_stats is not None
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # gradients flow into both transcriber and reconstructor via VAT+losses
    def total_loss(params):
        _, losses, _, _ = model.run_on_batch(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch_l, batch_ul, jax.random.PRNGKey(1), vat=True, train=True)
        total = sum(v for k, v in losses.items()
                    if k.startswith("loss/train_LDS")) \
            + losses["loss/train_frame"] + losses["loss/train_frame2"] \
            + losses["loss/train_reconstruction"]
        return total

    grads = jax.grad(total_loss)(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0

    # eval mode: test_* keys, no ul entries
    _, eval_losses, _, stats = model.run_on_batch(
        variables, batch_l, None, jax.random.PRNGKey(2),
        vat=False, train=False)
    assert all(k.startswith("loss/test") for k in eval_losses)
    assert stats is None


def test_transcribe_full_song_shape():
    model = ReconVAT()
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    # odd-length "song" — not a multiple of the crop size
    audio = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 512 * 101 + 37).astype(np.float32) * 0.1)
    preds = model.transcribe(variables, audio)
    assert preds["frame"].shape == (1, 101 + 1, 88)


def test_bucketed_transcribe_matches_exact():
    """Bucket padding must only perturb the end-halo frames."""
    model = ReconVAT(reconstruction=True)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=64)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(1, 512 * 77 + 13) * 0.1)
                        .astype(np.float32))
    exact = model.transcribe(variables, audio)["frame"]
    bucketed = model.transcribe(variables, audio,
                                bucket_frames=64)["frame"]
    assert bucketed.shape == exact.shape
    t = exact.shape[1]
    body = float(jnp.abs(bucketed[:, :t - 16] - exact[:, :t - 16]).max())
    assert body < 5e-3, body


def test_l2_normalize_zero_direction_is_finite():
    """Degenerate adversarial direction (gradient underflow on a saturated
    model): the guarded vector norm yields a zero perturbation, not NaN,
    and is bit-identical for non-degenerate rows (see vat.l2_normalize)."""
    from reconvat_tpu.vat import l2_normalize

    d = np.zeros((2, 4, 3, 1), np.float32)
    d[0, 0, :, 0] = [3.0, 0.0, 4.0]      # one normal row, rest zero
    out = np.asarray(l2_normalize(jnp.asarray(d), axis=2))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, 0, :, 0], [0.6, 0.0, 0.8], rtol=1e-6)
    assert (out[1] == 0).all()
