"""Batchwise min-max spectrogram normalization.

Mirrors reference `Normalization` (`model/utils.py:82-106`): 'framewise'
normalizes each time frame across bins (NaN -> 0 when a frame is constant),
'imagewise' normalizes each spectrogram by its global min/max. Operates on
time-major specs (batch, frames, bins); both modes are layout-equivalent to
the reference's (batch, bins, frames) version.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_framewise(x: jnp.ndarray, frame_mask=None) -> jnp.ndarray:
    # framewise statistics are per-frame, so padded frames cannot perturb
    # true frames — frame_mask is accepted for interface parity only.
    del frame_mask
    x_max = jnp.max(x, axis=-1, keepdims=True)
    x_min = jnp.min(x, axis=-1, keepdims=True)
    out = (x - x_min) / (x_max - x_min)
    return jnp.nan_to_num(out, nan=0.0)


def normalize_imagewise(x: jnp.ndarray, frame_mask=None) -> jnp.ndarray:
    """frame_mask (bool, (frames,)): restrict the min/max statistics to the
    true frames of a padded spectrogram (bucketed full-song evaluation), so
    the normalized values of true frames match the unpadded computation."""
    reduce_axes = tuple(range(1, x.ndim))
    if frame_mask is None:
        x_max = jnp.max(x, axis=reduce_axes, keepdims=True)
        x_min = jnp.min(x, axis=reduce_axes, keepdims=True)
    else:
        m = frame_mask.reshape((1, -1) + (1,) * (x.ndim - 2))
        x_max = jnp.max(jnp.where(m, x, -jnp.inf), axis=reduce_axes,
                        keepdims=True)
        x_min = jnp.min(jnp.where(m, x, jnp.inf), axis=reduce_axes,
                        keepdims=True)
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

    def transform(self, x: jnp.ndarray, frame_mask=None) -> jnp.ndarray:
        return self.normalize(x, frame_mask)

    __call__ = transform
