"""Batchwise min-max spectrogram normalization.

Mirrors reference `Normalization` (`model/utils.py:82-106`): 'framewise'
normalizes each time frame across bins (NaN -> 0 when a frame is constant),
'imagewise' normalizes each spectrogram by its global min/max. Operates on
time-major specs (batch, frames, bins); both modes are layout-equivalent to
the reference's (batch, bins, frames) version.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_framewise(x: jnp.ndarray) -> jnp.ndarray:
    x_max = jnp.max(x, axis=-1, keepdims=True)
    x_min = jnp.min(x, axis=-1, keepdims=True)
    out = (x - x_min) / (x_max - x_min)
    return jnp.nan_to_num(out, nan=0.0)


def normalize_imagewise(x: jnp.ndarray) -> jnp.ndarray:
    reduce_axes = tuple(range(1, x.ndim))
    x_max = jnp.max(x, axis=reduce_axes, keepdims=True)
    x_min = jnp.min(x, axis=reduce_axes, keepdims=True)
    return (x - x_min) / (x_max - x_min)


class Normalization:
    def __init__(self, mode: str = "framewise"):
        if mode == "framewise":
            self.normalize = normalize_framewise
        elif mode == "imagewise":
            self.normalize = normalize_imagewise
        else:
            raise ValueError(f"unknown normalization mode: {mode}")
        self.mode = mode

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.normalize(x)

    __call__ = transform
