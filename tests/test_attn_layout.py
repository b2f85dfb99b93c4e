"""Banded-attention context layouts (round 5).

Two bit-identical formulations of the halo context stacks: seq-major
(B, nb, ctx, H, Dh), the default, and head-major (B, nb, H, ctx, Dh),
built because tile-aware HLO accounting flagged the seq-major stacks as
8x sublane-padded at H=1 (bench_logs/r5_serve_hlo_bytes_before.log) —
the on-chip A/B then measured a tie both ways
(bench_logs/r5_attn_layout_{serve,train}_ab.log), so seq-major stays
the default and head-major remains selectable via
RECONVAT_ATTN_LAYOUT=head. These tests pin the bit-identity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reconvat_tpu.nn.attention import MultiHeadAttention1D, banded_attention


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("H,Dh,L,W", [(1, 352, 200, 31), (4, 16, 100, 7),
                                      (2, 64, 130, 31)])
def test_layouts_bit_identical_f64(x64, H, Dh, L, W):
    r = np.random.RandomState(0)
    hw = (W - 1) // 2
    q = jnp.asarray(r.randn(2, L, H, Dh))
    k = jnp.asarray(r.randn(2, L + 2 * hw, H, Dh))
    v = jnp.asarray(r.randn(2, L + 2 * hw, H, Dh))
    rel = jnp.asarray(r.randn(H, Dh, W))
    o_head, a_head = banded_attention(q, k, v, rel, W, 64, True)
    o_seq, a_seq = banded_attention(q, k, v, rel, W, 64, True,
                                    seq_major=True)
    assert float(jnp.abs(o_head - o_seq).max()) == 0.0
    assert float(jnp.abs(a_head - a_seq).max()) == 0.0


def test_layout_grads_bit_identical_f64(x64):
    r = np.random.RandomState(1)
    H, Dh, L, W = 1, 96, 150, 31
    hw = (W - 1) // 2
    q = jnp.asarray(r.randn(2, L, H, Dh))
    k = jnp.asarray(r.randn(2, L + 2 * hw, H, Dh))
    v = jnp.asarray(r.randn(2, L + 2 * hw, H, Dh))
    rel = jnp.asarray(r.randn(H, Dh, W))

    def grads(sm):
        def f(q, k, v, rel):
            out, _ = banded_attention(q, k, v, rel, W, 64, False,
                                      seq_major=sm)
            return jnp.sum(out * jnp.cos(out))
        return jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, rel)

    for a, b in zip(grads(False), grads(True)):
        assert float(jnp.abs(a - b).max()) == 0.0


def test_env_knob_selects_head_major(monkeypatch):
    """The opt-in knob selects the identical-numerics alternative."""
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 64, 40).astype(np.float32))
    mod = MultiHeadAttention1D(out_features=48, kernel_size=7)
    var = mod.init(jax.random.PRNGKey(0), x)
    out0, att0 = mod.apply(var, x)
    monkeypatch.setenv("RECONVAT_ATTN_LAYOUT", "head")
    out1, att1 = mod.apply(var, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(att0), np.asarray(att1),
                               rtol=0, atol=1e-6)
