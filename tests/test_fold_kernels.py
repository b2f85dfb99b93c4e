"""General folded-kernel scatters vs plain convs, per-op oracles.

Covers the Segmentation-family configurations that the flagship U-Net
fold modes don't exercise: 7-tap pad-3 convs, 3-tap stride-2 pad-1
downsamplers, 1x1 stride-2 skips, and 3x3 stride-2 transpose convs with
TF-SAME right-cropping (reference `model/Segmentation.py:76-133`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconvat_tpu.nn.unet import (FoldSpec, fold_conv_kernel,
                                  fold_convT_kernel)

_DN = ("NHWC", "HWIO", "NHWC")


def _plain_conv(x4, K, stride, pad):
    """NHWC conv with explicit symmetric-ish freq pad (pad, pad_hi)."""
    kh, kw = K.shape[:2]
    return jax.lax.conv_general_dilated(
        x4, K, window_strides=(1, stride),
        padding=[(kh // 2, kh // 2), pad], dimension_numbers=_DN)


def _fold(x4, fs: FoldSpec):
    """(B, T, F, C) -> (B, T, blocks, k*C) with channel index jj*C+c."""
    B, T, F, C = x4.shape
    if fs.has_pad:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, fs.carried - F), (0, 0)))
    return x4.reshape(B, T, fs.blocks, fs.k * C)


def _unfold(xf, fs: FoldSpec, C):
    B, T, bl, kc = xf.shape
    assert kc == fs.k * C
    return xf.reshape(B, T, bl * fs.k, C)[:, :, :fs.F]


def _run_folded_conv(x4, K, fs_in, fs_out, stride, pad):
    kh = K.shape[0]
    Kf, pl = fold_conv_kernel(jnp.asarray(K), fs_in.k, stride, pad)
    xf = _fold(x4, fs_in)
    pr = fs_out.blocks - fs_in.blocks + Kf.shape[1] - 1 - pl
    assert pr >= 0, (fs_out.blocks, fs_in.blocks, Kf.shape, pl)
    out = jax.lax.conv_general_dilated(
        xf, Kf, window_strides=(1, 1),
        padding=[(kh // 2, kh // 2), (pl, pr)], dimension_numbers=_DN)
    return fs_out.mask_mul(out)


@pytest.mark.parametrize("F,k,kw,stride,pad,ci,co", [
    (229, 4, 7, 1, 3, 1, 8),     # Segmentation encoding_layer geometry
    (229, 4, 3, 2, 1, 8, 8),     # layer1a downsampler (TF-SAME odd F)
    (115, 4, 3, 1, 1, 8, 8),     # layer1b
    (115, 4, 3, 2, 1, 8, 4),     # layer2a
    (229, 4, 1, 2, 0, 8, 8),     # conv_skip 1x1 stride 2
    (57, 2, 3, 1, 1, 4, 4),      # non-divisible F with carry bins
    (29, 1, 3, 1, 1, 4, 4),      # degenerate fold
])
def test_fold_conv_kernel_matches_plain(F, k, kw, stride, pad, ci, co):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, F, ci).astype(np.float32)
    K = rng.randn(3, kw, ci, co).astype(np.float32)
    F_out = (F + 2 * pad - kw) // stride + 1

    with jax.default_matmul_precision("highest"):
        ref = _plain_conv(jnp.asarray(x), jnp.asarray(K), stride,
                          (pad, F_out * stride - F - pad + kw - stride))
        ref = ref[:, :, :F_out]

        fs_in, fs_out = FoldSpec(F, k), FoldSpec(F_out, k // stride)
        out = _run_folded_conv(jnp.asarray(x), K, fs_in, fs_out, stride, pad)
        out = _unfold(out, fs_out, co)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("F,k,kw,ci,co", [
    (115, 2, 3, 8, 4),    # Segmentation TransposeConvBlock geometry
    (58, 1, 3, 8, 4),
    (57, 2, 3, 4, 4),     # carry-bin input
    (115, 2, 1, 8, 4),    # conv_skip transpose 1x1 stride 2
])
def test_fold_convT_kernel_matches_plain(F, k, kw, ci, co):
    """Freq transpose-conv stride 2, raw out 2F+kw-2 cropped to 2F from
    the left edge (left crop 0 — the TF-SAME case, see
    `models/segmentation.transpose_padding_same`)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, F, ci).astype(np.float32)
    K = rng.randn(kw, kw, co, ci).astype(np.float32)  # torch HWOI
    F_out = 2 * F

    with jax.default_matmul_precision("highest"):
        # reference: lhs-dilated correlation with double-flipped kernel
        rhs = jnp.transpose(jnp.asarray(K)[::-1, ::-1], (0, 1, 3, 2))
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), rhs, window_strides=(1, 1),
            padding=[(kw - 1, kw - 1), (kw - 1, kw - 1)],
            lhs_dilation=(2, 2), dimension_numbers=_DN)
        # crop time to 2T from the left-pad top, freq to 2F; rows the
        # raw output lacks (torch output_padding, kw=1 only) are zero
        ref = ref[:, :x.shape[1] * 2, :F_out]
        ref = jnp.pad(ref, ((0, 0), (0, 2 * x.shape[1] - ref.shape[1]),
                            (0, F_out - ref.shape[2]), (0, 0)))

        fs_in, fs_out = FoldSpec(F, k), FoldSpec(F_out, 2 * k)
        Kf, pl = fold_convT_kernel(jnp.asarray(K), k, 2)
        xf = _fold(jnp.asarray(x), fs_in)
        pr = fs_out.blocks - fs_in.blocks + Kf.shape[1] - 1 - pl
        out = jax.lax.conv_general_dilated(
            xf, Kf, window_strides=(1, 1),
            padding=[(kw - 1, kw - 1), (pl, pr)],
            lhs_dilation=(2, 1), dimension_numbers=_DN)
        out = out[:, :x.shape[1] * 2]
        out = jnp.pad(out, ((0, 0), (0, 2 * x.shape[1] - out.shape[1]),
                            (0, 0), (0, 0)))
        out = _unfold(fs_out.mask_mul(out), fs_out, co)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_conv_kernel_randomized_sweep():
    """Property sweep: random (F, k, kw, stride, pad) conv configs beyond
    the hand-picked model geometries."""
    rng = np.random.RandomState(42)
    for _ in range(20):
        k = int(rng.choice([1, 2, 4, 8]))
        stride = int(rng.choice([s for s in (1, 2) if k % s == 0]))
        kw = int(rng.choice([1, 3, 5, 7]))
        pad = int(rng.randint(0, kw))
        F = int(rng.randint(max(kw, 2 * stride), 80))
        F_out = (F + 2 * pad - kw) // stride + 1
        if F_out <= 0:
            continue
        ci, co = int(rng.randint(1, 5)), int(rng.randint(1, 5))
        x = rng.randn(1, 4, F, ci).astype(np.float32)
        K = rng.randn(3, kw, ci, co).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            ref = _plain_conv(jnp.asarray(x), jnp.asarray(K), stride,
                              (pad, F_out * stride - F - pad + kw - stride))
            ref = ref[:, :, :F_out]
            fs_in = FoldSpec(F, k)
            fs_out = FoldSpec(F_out, max(1, k // stride))
            out = _run_folded_conv(jnp.asarray(x), K, fs_in, fs_out,
                                   stride, pad)
            out = _unfold(out, fs_out, co)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"F={F} k={k} kw={kw} s={stride} p={pad}")
