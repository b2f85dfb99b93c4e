"""Checkpoint save/restore (single orbax format + auto-resume).

Replaces the reference's two inconsistent torch formats (state_dict
snapshots at `train_UNet_Onset_VAT.py:150-152`, whole-pickled-model resume
at `:117-118`) with one orbax tree format and latest-checkpoint discovery.
"""
from __future__ import annotations

import os
import re

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, step: int, state) -> str:
    path = os.path.abspath(os.path.join(directory, f"model-{step}"))
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": np.asarray(state.step)}
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    ckptr = _ckptr()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory: str):
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = re.fullmatch(r"model-(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, name), int(m.group(1))
    return best


def restore_checkpoint(path: str, state):
    import orbax.checkpoint as ocp

    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": np.asarray(state.step)}
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    restored = _ckptr().restore(os.path.abspath(path),
                                target=jax.tree_util.tree_map(np.asarray,
                                                              tree))
    state = state.replace(params=restored["params"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    if "batch_stats" in restored and state.batch_stats is not None:
        state = state.replace(batch_stats=restored["batch_stats"])
    return state
