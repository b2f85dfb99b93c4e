"""Onsets-and-Frames (CNN-BiLSTM) parity tests vs the reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.models.onsets_frames import OnsetsAndFrames
from reconvat_tpu.nn.layers import BiLSTM, ConvStack, lstm_torch_entries
from reconvat_tpu.train.torch_convert import torch_to_flax

from . import reference_oracle


def test_bilstm_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    ref = torch.nn.LSTM(12, 5, batch_first=True, bidirectional=True)
    x = np.random.RandomState(0).randn(2, 20, 12).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = ref(torch.tensor(x))

    mod = BiLSTM(5)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {f"lstm.{k}": p.detach().numpy() for k, p in
          ref.named_parameters()}
    entries = lstm_torch_entries("lstm", "x", sd)
    params = jax.tree_util.tree_map(np.asarray, dict(v["params"]))
    for key_str, val in entries.items():
        parts = key_str.split("/")[1:]
        node = params
        for p in parts[:-1]:
            node = node[p]
        assert node[parts[-1]].shape == val.shape, key_str
        node[parts[-1]] = val
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_bilstm_grads_match_torch():
    """Backward through the fused two-direction scan: the bwd direction's
    input is time-flipped before the scan and the outputs unflipped after,
    so its cotangents traverse the flips in reverse — compare d/dx and
    d/dparams of a scalar loss against torch autograd."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    ref = torch.nn.LSTM(12, 5, batch_first=True, bidirectional=True)
    x_np = np.random.RandomState(1).randn(2, 20, 12).astype(np.float32)
    w_np = np.random.RandomState(2).randn(2, 20, 10).astype(np.float32)

    xt = torch.tensor(x_np, requires_grad=True)
    out_ref, _ = ref(xt)
    (out_ref * torch.tensor(w_np)).sum().backward()

    mod = BiLSTM(5)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    sd = {f"lstm.{k}": p.detach().numpy() for k, p in
          ref.named_parameters()}
    entries = lstm_torch_entries("lstm", "x", sd)
    params = jax.tree_util.tree_map(np.asarray, dict(v["params"]))
    for key_str, val in entries.items():
        parts = key_str.split("/")[1:]
        node = params
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = val

    def loss(params, x):
        out = mod.apply({"params": params}, x)
        return (out * jnp.asarray(w_np)).sum()

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    # torch's fused-gate grads: ours vs weight_ih_l0 (transposed) etc.;
    # the fused bias grad equals both torch bias grads (identical by
    # construction), check against bias_ih.
    tg = {k: p.grad.numpy() for k, p in ref.named_parameters()}
    np.testing.assert_allclose(np.asarray(gp["fwd_w_ih"]),
                               tg["weight_ih_l0"].T, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["fwd_w_hh"]),
                               tg["weight_hh_l0"].T, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["fwd_bias"]),
                               tg["bias_ih_l0"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["bwd_w_ih"]),
                               tg["weight_ih_l0_reverse"].T,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["bwd_w_hh"]),
                               tg["weight_hh_l0_reverse"].T,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["bwd_bias"]),
                               tg["bias_ih_l0_reverse"], rtol=1e-4,
                               atol=1e-5)


def test_bilstm_unroll_is_numerically_identical(monkeypatch):
    """RECONVAT_LSTM_UNROLL is a pure scheduling knob: scan unrolling
    must not change a single bit of the output."""
    x = jnp.asarray(np.random.RandomState(3).randn(2, 17, 12)
                    .astype(np.float32))
    mod = BiLSTM(5)
    v = mod.init(jax.random.PRNGKey(7), x)
    base = np.asarray(jax.jit(mod.apply)(v, x))
    monkeypatch.setenv("RECONVAT_LSTM_UNROLL", "4")
    unrolled = np.asarray(jax.jit(mod.apply)(v, x))
    np.testing.assert_array_equal(base, unrolled)


def test_bilstm_fresh_bias_matches_torch_distribution():
    """Fused bias stands for torch's b_ih + b_hh: two independent
    U(+-1/sqrt(H)) draws summed (triangular on +-2/sqrt(H)). A single
    uniform draw would never exceed 1/sqrt(H); the correct sum does with
    probability 1/4 per element."""
    H = 64
    mod = BiLSTM(H)
    x = jnp.zeros((1, 4, 8), jnp.float32)
    params = mod.init(jax.random.PRNGKey(42), x)["params"]
    bound = 1.0 / np.sqrt(H)
    for direction in ("fwd", "bwd"):
        b = np.asarray(params[f"{direction}_bias"])
        assert b.shape == (4 * H,)
        assert np.all(np.abs(b) <= 2 * bound + 1e-7)
        # with 256 samples, P(none exceeds bound) = 0.75^256 ~ 1e-32
        assert np.any(np.abs(b) > bound)
        # and the weights stay single-draw uniform
        w = np.asarray(params[f"{direction}_w_ih"])
        assert np.all(np.abs(w) <= bound + 1e-7)


def test_convstack_matches_reference():
    torch = pytest.importorskip("torch")
    ofv = reference_oracle.reference_module("onset_frame_VAT")
    torch.manual_seed(1)
    ref = ofv.ConvStack(229, 768).eval()
    x = np.random.RandomState(0).randn(1, 32, 229).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x))  # reference views (B,T,F) to NCHW

    mod = ConvStack(229, 768)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    sd = {}
    for k, p in ref.state_dict().items():
        k2 = (k.replace("cnn.0.", "conv0.").replace("cnn.1.", "bn0.")
              .replace("cnn.3.", "conv1.").replace("cnn.4.", "bn1.")
              .replace("cnn.8.", "conv2.").replace("cnn.9.", "bn2.")
              .replace("fc.0.", "fc."))

        sd[k2] = p
    converted, report = torch_to_flax(sd, v)
    assert not report["skipped"], report["skipped"]
    out = mod.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_onsets_frames_full_matches_reference():
    torch = pytest.importorskip("torch")
    ofv = reference_oracle.reference_module("onset_frame_VAT")
    torch.manual_seed(2)
    ref = ofv.OnsetsAndFrames_VAT_full(229, 88, model_complexity=16).eval()
    x = np.random.RandomState(3).rand(1, 40, 229).astype(np.float32)
    with torch.no_grad():
        onset_ref, act_ref, frame_ref = ref(torch.tensor(x))

    model = OnsetsAndFrames(model_complexity=16)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(ref.state_dict(), f.name)
        variables = model.init(jax.random.PRNGKey(0), seq_frames=40)
        converted = model.load_reference_weights(f.name, variables)

    onset, act, frame = model.module.apply(converted, jnp.asarray(x),
                                           train=False)
    np.testing.assert_allclose(np.asarray(onset), onset_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(act), act_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(frame), frame_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_onsets_frames_run_on_batch():
    model = OnsetsAndFrames(model_complexity=8)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=32)
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(2, 32 * 512).astype(np.float32)
                             * 0.1),
        "frame": jnp.asarray((rng.rand(2, 32, 88) > 0.9)
                             .astype(np.float32)),
        "onset": jnp.asarray((rng.rand(2, 32, 88) > 0.97)
                             .astype(np.float32)),
    }
    preds, losses, spec, stats = model.run_on_batch(
        variables, batch, batch, jax.random.PRNGKey(1), vat=True,
        train=True)
    assert {"loss/train_frame", "loss/train_onset", "loss/train_LDS_l",
            "loss/train_LDS_ul", "loss/train_r_norm_l",
            "loss/train_r_norm_ul"} == set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert preds["frame"].shape == (2, 32, 88)


@pytest.mark.slow
def test_frame_stack_vat_matches_reference():
    """Frame-stack ablation full-forward parity (ConvStack renames +
    BiLSTM gate conversion, all through the production
    load_reference_weights path)."""
    torch = pytest.importorskip("torch")
    ofv = reference_oracle.reference_module("onset_frame_VAT")
    torch.manual_seed(4)
    ref = ofv.Frame_stack_VAT(229, 88, model_complexity=16).eval()
    x = np.random.RandomState(5).rand(1, 40, 229).astype(np.float32)
    with torch.no_grad():
        act_ref, frame_ref = ref(torch.tensor(x))

    from reconvat_tpu.models.onsets_frames import FrameStackVAT

    model = FrameStackVAT(model_complexity=16)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(ref.state_dict(), f.name)
        variables = model.init(jax.random.PRNGKey(0), seq_frames=40)
        converted = model.load_reference_weights(f.name, variables)
    act, frame = model.module.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(act), act_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(frame), frame_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_onset_stack_vat_matches_reference():
    torch = pytest.importorskip("torch")
    ofv = reference_oracle.reference_module("onset_frame_VAT")
    torch.manual_seed(6)
    ref = ofv.Onset_stack_VAT(229, 88, model_complexity=16).eval()
    x = np.random.RandomState(7).rand(1, 40, 229).astype(np.float32)
    with torch.no_grad():
        onset_ref = ref(torch.tensor(x))

    from reconvat_tpu.models.onsets_frames import OnsetStackVAT

    model = OnsetStackVAT(model_complexity=16)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(ref.state_dict(), f.name)
        variables = model.init(jax.random.PRNGKey(0), seq_frames=40)
        converted = model.load_reference_weights(f.name, variables)
    onset = model.module.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(onset), onset_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
