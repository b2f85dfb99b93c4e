"""Misc host utilities: piano-roll PNGs, parameter counts, cycling."""
from __future__ import annotations

import numpy as np


def cycle(iterable):
    while True:
        for item in iterable:
            yield item


def save_pianoroll(path, onsets, frames, onset_threshold=0.5,
                   frame_threshold=0.5, zoom=4):
    """Piano-roll PNG identical to reference `save_pianoroll`
    (`model/utils.py:61-80`): inverted onset/frame/both RGB, flipped
    vertically, x`zoom` vertical resize."""
    from PIL import Image

    onsets = np.asarray(onsets)
    frames = np.asarray(frames)
    onsets = (1 - (onsets.T > onset_threshold).astype(np.uint8))
    frames = (1 - (frames.T > frame_threshold).astype(np.uint8))
    both = 1 - (1 - onsets) * (1 - frames)
    image = np.stack([onsets, frames, both], axis=2)[::-1] * 255
    image = Image.fromarray(image.astype(np.uint8), "RGB")
    image = image.resize((image.size[0], image.size[1] * zoom))
    image.save(path)


def param_count(params) -> int:
    import jax

    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def summary(name, variables, file=None):
    """Print a parameter-count summary (reference `summary`,
    `model/utils.py:15-58`, sans torch-module recursion)."""
    import sys

    import jax

    out = file or sys.stdout
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(variables.get("params",
                                                              variables))[0]
    for path, leaf in flat:
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        total += n
    print(f"{name}: {total:,} params", file=out)
    return total
