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


_ASYNC_CKPTR = None


def _async_ckptr():
    """Process-wide AsyncCheckpointer: `save` returns once the arrays are
    copied to host (safe with donated train-state buffers — the next step
    may reuse the device memory immediately) and serializes to disk in a
    background thread; orbax writes to a temp dir and renames atomically,
    so `latest_checkpoint` never sees a partial save."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import atexit

        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_ASYNC_CKPTR.wait_until_finished)
    return _ASYNC_CKPTR


def save_checkpoint(directory: str, step: int, state,
                    block: bool = False) -> str:
    """Save the train state; non-blocking by default (the reference's
    torch.save stalls the step loop at every saving_freq,
    `train_UNet_Onset_VAT.py:150-152`). block=True waits for the write —
    use before reading the checkpoint back in the same process.
    """
    path = os.path.abspath(os.path.join(directory, f"model-{step}"))
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": np.asarray(state.step)}
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    if jax.process_count() > 1:
        # multi-host: state is fully replicated (parallel/mesh.replicate),
        # so every process holds the complete tree — host 0 writes it as
        # plain numpy through a host-0-only checkpointer
        # (active_processes={0}; a default orbax checkpointer would
        # barrier over sync_global_devices and deadlock the other hosts),
        # then everyone barriers so no process races past an unfinished
        # write. Assumes `directory` is shared storage, as on a pod.
        tree = jax.tree_util.tree_map(np.asarray, tree)
        if jax.process_index() == 0:
            import orbax.checkpoint as ocp

            solo = ocp.Checkpointer(
                ocp.StandardCheckpointHandler(),
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=0, active_processes={0}))
            solo.save(path, tree, force=True)
        from ..parallel.distributed import sync

        sync(f"ckpt-{step}")
        return path
    ckptr = _async_ckptr()
    ckptr.save(path, tree, force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def wait_for_checkpoints() -> None:
    """Block until all in-flight async checkpoint writes land."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


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
