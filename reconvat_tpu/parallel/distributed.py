"""Multi-host (DCN) initialization for MAESTRO-scale data parallelism.

The reference trains on one GPU (`train_UNet_Onset_VAT.py:34`); scaling its
semi-supervised runs across hosts is a rebuild design goal (SURVEY §2.5).
This wraps `jax.distributed.initialize`: call `initialize(...)` once per
process before any other jax use, then build the (dcn, dp, sp) mesh with
`parallel.mesh.make_multihost_mesh`. Gradient all-reduce is the only
collective that crosses DCN (see mesh.py).

On TPU pods the arguments are auto-detected from the environment; on a CPU
test cluster (or GPU) pass them explicitly.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def is_initialized() -> bool:
    return _INITIALIZED or jax.process_count() > 1


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Idempotent `jax.distributed.initialize`.

    With no arguments, jax auto-detects TPU-pod / cluster environments
    (megascale coordinator, SLURM, ...). For manual clusters set
    coordinator_address ("host:port"), num_processes and process_id, or the
    env vars JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _INITIALIZED = True


def sync(name: str = "sync") -> None:
    """Barrier across all processes (no-op single-process)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
