"""Device-mesh parallelism: data parallel + sequence (context) parallel,
single-host (ICI) or multi-host (DCN).

The reference is strictly single-device (SURVEY §2.5 — no DP/TP/PP/SP and no
communication backend). Here parallelism is a first-class design:

* mesh axes: optional 'dcn' (hosts) x 'dp' (batch) x 'sp' (posteriogram
  time axis); batch shards over ('dcn', 'dp'), so in a multi-host run only
  the gradient all-reduce crosses DCN — activations never leave a host;
* inputs are sharded batch-over-(dcn,dp), time-over-sp; params replicated;
* XLA GSPMD inserts the collectives — gradient psum over 'dp' rides ICI
  (and its 'dcn' leg the data-center network), conv/attention halo
  exchanges over 'sp' come from spatial partitioning (the window-31 local
  attention needs only a 15-frame halo, so SP scales full-song
  transcription nearly linearly);
* TP/PP/EP are intentionally out of scope at <2M-30M params (SURVEY §2.5):
  a tensor-parallel split of a 916-wide attention would ship more bytes
  over ICI than it saves in FLOP time.

`spec_constraint` is called inside the models' `make_spec`, so the same
model code runs single-chip (no-op), under a single-host mesh (sharded), or
across hosts (`jax.distributed` — see `parallel/distributed.py`).
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
                 time_axis: str = "sp", dcn_axis: str = "dcn"):
        self.mesh = mesh
        self.time_axis = time_axis if time_axis in mesh.axis_names else None
        dp = batch_axis if batch_axis in mesh.axis_names else None
        if dcn_axis in mesh.axis_names:
            # batch dimension shards over hosts first, then local devices
            self.batch_axis = (dcn_axis, dp) if dp else dcn_axis
        else:
            self.batch_axis = dp
        self.multihost = any(d.process_index != jax.process_index()
                             for d in mesh.devices.flat)

    def sharding(self, *axes):
        return NamedSharding(self.mesh, P(*axes))

    @property
    def batch_shards(self) -> int:
        """Number of ways the batch axis is split (dcn x dp)."""
        ax = self.batch_axis
        if ax is None:
            return 1
        axes = ax if isinstance(ax, tuple) else (ax,)
        n = 1
        for a in axes:
            if a:
                n *= self.mesh.shape[a]
        return n

    @property
    def time_shards(self) -> int:
        """Number of ways the posteriogram time axis is split (sp)."""
        return self.mesh.shape[self.time_axis] if self.time_axis else 1


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              sp: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != devices({n})"
    arr = np.asarray(devices[:n]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def make_multihost_mesh(dp: Optional[int] = None, sp: int = 1) -> Mesh:
    """(dcn, dp, sp) mesh: dcn = one slice per process (DCN-connected),
    dp x sp = each process's local devices (ICI-connected). Requires
    `jax.distributed.initialize` to have run (parallel/distributed.py)."""
    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    if dp is None:
        dp = n_local // sp
    assert dp * sp == n_local, \
        f"dp({dp}) * sp({sp}) != local devices({n_local})"
    # process-major ordering keeps each (dp, sp) plane on one host, so only
    # the dcn axis (gradient psum) crosses the data-center network
    devices = sorted(jax.devices(),
                     key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(n_proc, dp, sp)
    return Mesh(arr, ("dcn", "dp", "sp"))


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
    """Shard a (B, T, F, ...) spec image batch-over-dp, time-over-sp.

    An axis that does not divide over its mesh axis is left unsharded —
    e.g. a batch-1 full-song eval under a dp=4 training mesh runs with a
    replicated batch axis but still time-shards over sp (the long-context
    path), instead of erroring."""
    ctx = _ACTIVE
    if ctx is None:
        return x
    batch_axis = (ctx.batch_axis
                  if x.shape[0] % max(ctx.batch_shards, 1) == 0 else None)
    time_axis = (ctx.time_axis
                 if x.ndim > 1 and ctx.time_axis is not None
                 and x.shape[1] % max(ctx.time_shards, 1) == 0 else None)
    axes = [batch_axis, time_axis] + [None] * (x.ndim - 2)
    return jax.lax.with_sharding_constraint(x, ctx.sharding(*axes))


def shard_batch(batch: dict, ctx: MeshContext) -> dict:
    """Place a host batch on the mesh: batch axis over (dcn,)dp, time over
    sp where a time axis exists (labels); raw audio is batch-sharded only
    (the frontend's framing gather would need halo samples — cheaper to let
    GSPMD handle it after the spec constraint).

    Under a multi-host mesh, `batch` is this process's LOCAL portion of the
    global batch (each host loads its own shard); the global array is
    assembled with `jax.make_array_from_process_local_data`.
    """
    n_proc = jax.process_count() if ctx.multihost else 1
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim >= 2 and k in ("onset", "offset", "frame", "velocity"):
            sh = ctx.sharding(ctx.batch_axis, ctx.time_axis,
                              *([None] * (v.ndim - 2)))
        else:
            sh = ctx.sharding(ctx.batch_axis, *([None] * (v.ndim - 1)))
        if ctx.multihost:
            gshape = (v.shape[0] * n_proc,) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(sh, v, gshape)
        else:
            out[k] = jax.device_put(v, sh)
    return out


def replicate(tree, ctx: MeshContext):
    """Replicate a (host-identical) pytree over every mesh device. In a
    multi-host mesh this relies on all processes holding the same values
    (same init seed / restored checkpoint)."""
    sh = ctx.sharding()  # fully replicated
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sh), tree)
