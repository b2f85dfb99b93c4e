"""Neural-net building-block parity vs the reference torch modules."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.nn import attention as attn_mod
from reconvat_tpu.nn import unet as unet_mod
from reconvat_tpu.train.torch_convert import torch_to_flax

from . import reference_oracle


def _np(x):
    return x.detach().cpu().numpy()


@pytest.mark.parametrize("L,block", [(50, 16), (64, 64), (100, 128), (7, 128)])
def test_local_attention_matches_reference(L, block):
    torch = pytest.importorskip("torch")
    sa = reference_oracle.reference_module("self_attention")
    torch.manual_seed(0)
    ref = sa.MutliHeadAttention1D(in_features=24, out_features=32,
                                  kernel_size=7, groups=4).eval()

    x = np.random.RandomState(1).randn(2, L, 24).astype(np.float32)
    with torch.no_grad():
        out_ref, attn_ref = ref(torch.tensor(x))

    mod = attn_mod.MultiHeadAttention1D(out_features=32, kernel_size=7,
                                        groups=4, block_size=block)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted, report = torch_to_flax(ref.state_dict(), variables)
    assert not report["skipped"], report["skipped"]
    out, attn = mod.apply(converted, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out), _np(out_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(attn), _np(attn_ref),
                               rtol=1e-4, atol=1e-5)


def test_local_attention_full_size_config():
    """The Spec2Roll config: 229 -> 916 features, window 31, 4 heads."""
    torch = pytest.importorskip("torch")
    sa = reference_oracle.reference_module("self_attention")
    torch.manual_seed(3)
    ref = sa.MutliHeadAttention1D(229, 916, 31, groups=4).eval()
    x = np.random.RandomState(2).randn(1, 160, 229).astype(np.float32)
    with torch.no_grad():
        out_ref, attn_ref = ref(torch.tensor(x))

    mod = attn_mod.MultiHeadAttention1D(out_features=916, kernel_size=31,
                                        groups=4)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted, _ = torch_to_flax(ref.state_dict(), variables)
    out, attn = mod.apply(converted, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _np(out_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn), _np(attn_ref),
                               rtol=1e-4, atol=1e-5)


def _torch_nchw(x):
    import torch
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


def _from_nchw(t):
    return np.transpose(_np(t), (0, 2, 3, 1))


@pytest.mark.parametrize("train", [False, True])
def test_enc_block_matches_reference(train):
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    torch.manual_seed(0)
    ref = sav.block(1, 16, (3, 3), (1, 1), (2, 2), (2, 2))
    ref = ref.train() if train else ref.eval()

    x = np.random.RandomState(0).randn(2, 32, 29, 1).astype(np.float32)
    with torch.no_grad():
        out_ref, _, size_ref = ref(_torch_nchw(x))

    mod = unet_mod.EncBlock(16)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    converted, report = torch_to_flax(ref.state_dict(), variables)
    assert not report["skipped"], report["skipped"]
    if train:
        (out, size), _ = mod.apply(converted, jnp.asarray(x), train=True,
                                   mutable=["batch_stats"])
    else:
        out, size = mod.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), _from_nchw(out_ref),
                               rtol=1e-3, atol=1e-4)
    assert tuple(size) == tuple(size_ref[2:])


@pytest.mark.parametrize("num_inst", [1, 2])
def test_encoder_decoder_matches_reference(num_inst):
    torch = pytest.importorskip("torch")
    mod_name = "self_attention_VAT" if num_inst == 1 else "UNet_onset"
    ref_mod = reference_oracle.reference_module(mod_name)
    torch.manual_seed(0)
    enc_ref = ref_mod.Encoder((2, 2), (2, 2)).eval()
    if num_inst == 1:
        dec_ref = ref_mod.Decoder((2, 2), (2, 2)).eval()
    else:
        dec_ref = ref_mod.Decoder((2, 2), (2, 2), num_inst).eval()

    x = np.random.RandomState(5).randn(2, 64, 229, 1).astype(np.float32)
    with torch.no_grad():
        z_ref, s_ref, c_ref = enc_ref(_torch_nchw(x))
        out_ref = dec_ref(z_ref, s_ref, c_ref)

    enc = unet_mod.Encoder()
    dec = unet_mod.Decoder(num_instruments=num_inst)
    xj = jnp.asarray(x)
    enc_vars = enc.init(jax.random.PRNGKey(0), xj, train=False)
    enc_conv, rep = torch_to_flax(enc_ref.state_dict(), enc_vars)
    assert not rep["skipped"], rep["skipped"]
    z, s, c = enc.apply(enc_conv, xj, train=False)

    dec_vars = dec.init(jax.random.PRNGKey(1), z, s, c, train=False)
    dec_conv, rep = torch_to_flax(dec_ref.state_dict(), dec_vars)
    assert not rep["skipped"], rep["skipped"]
    out = dec.apply(dec_conv, z, s, c, train=False)

    np.testing.assert_allclose(np.asarray(z), _from_nchw(z_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), _from_nchw(out_ref),
                               rtol=1e-2, atol=1e-3)
    assert np.asarray(out).shape == (2, 64, 229, num_inst)


def test_conv_transpose_output_size_shapes():
    """Odd/even target-size resolution (PyTorch output_size semantics)."""
    mod = unet_mod.TorchConvTranspose(4, (2, 2), (2, 2), (0, 0))
    x = jnp.zeros((1, 28, 57, 3))
    for target in [(56, 114), (57, 115), (56, 115)]:
        v = mod.init(jax.random.PRNGKey(0), x, output_size=target)
        y = mod.apply(v, x, output_size=target)
        assert y.shape[1:3] == target
    with pytest.raises(ValueError):
        v = mod.init(jax.random.PRNGKey(0), x, output_size=(58, 114))
