"""Device-mesh parallelism: data parallel + sequence (context) parallel.

The reference is strictly single-device (SURVEY §2.5 — no DP/TP/PP/SP and no
communication backend). Here parallelism is a first-class design:

* mesh axes: 'dp' (batch) x 'sp' (posteriogram time axis);
* inputs are sharded batch-over-dp, time-over-sp; parameters replicated;
* XLA GSPMD inserts the collectives — gradient psum over 'dp' rides ICI,
  conv/attention halo exchanges over 'sp' come from spatial partitioning
  (the window-31 local attention needs only a 15-frame halo, so SP scales
  full-song transcription nearly linearly);
* TP/PP/EP are intentionally out of scope at <2M-30M params (SURVEY §2.5):
  a tensor-parallel split of a 916-wide attention would ship more bytes
  over ICI than it saves in FLOP time.

`spec_constraint` is called inside the models' `make_spec`, so the same
model code runs single-chip (no-op) or under a mesh (sharded).
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Optional["MeshContext"] = None


class MeshContext:
    def __init__(self, mesh: Mesh, batch_axis: str = "dp",
                 time_axis: str = "sp"):
        self.mesh = mesh
        self.batch_axis = batch_axis if batch_axis in mesh.axis_names \
            else None
        self.time_axis = time_axis if time_axis in mesh.axis_names else None

    def sharding(self, *axes):
        return NamedSharding(self.mesh, P(*axes))


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              sp: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != devices({n})"
    arr = np.asarray(devices[:n]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


@contextlib.contextmanager
def activate(mesh: Mesh, batch_axis: str = "dp", time_axis: str = "sp"):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = MeshContext(mesh, batch_axis, time_axis)
    try:
        yield _ACTIVE
    finally:
        _ACTIVE = prev


def active() -> Optional[MeshContext]:
    return _ACTIVE


def spec_constraint(x):
    """Shard a (B, T, F, ...) spec image batch-over-dp, time-over-sp."""
    ctx = _ACTIVE
    if ctx is None:
        return x
    axes = [ctx.batch_axis, ctx.time_axis] + [None] * (x.ndim - 2)
    return jax.lax.with_sharding_constraint(x, ctx.sharding(*axes))


def shard_batch(batch: dict, ctx: MeshContext) -> dict:
    """Place a host batch on the mesh: batch axis over dp, time over sp
    where a time axis exists (labels); raw audio is batch-sharded only (the
    frontend's framing gather would need halo samples — cheaper to let
    GSPMD handle it after the spec constraint)."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim >= 2 and k in ("onset", "offset", "frame", "velocity"):
            sh = ctx.sharding(ctx.batch_axis, ctx.time_axis,
                              *([None] * (v.ndim - 2)))
        else:
            sh = ctx.sharding(ctx.batch_axis, *([None] * (v.ndim - 1)))
        out[k] = jax.device_put(v, sh)
    return out


def replicate(tree, ctx: MeshContext):
    sh = ctx.sharding()  # fully replicated
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
