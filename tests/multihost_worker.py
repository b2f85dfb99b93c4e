"""Worker for test_multihost.py: one process of a CPU jax.distributed
cluster running a full VAT train step on the (dcn, dp, sp) mesh.

Invoked as:  python -m tests.multihost_worker <proc> <nproc> <port> <out>
With nproc=1 it runs the single-process baseline on a (dp, sp) mesh over
the same global batch — the number the cluster must reproduce.
"""
import json
import sys


def global_batch(seed, batch, frames):
    import numpy as np

    r = np.random.RandomState(seed)
    return {
        "audio": (r.randn(batch, frames * 512) * 0.1).astype(np.float32),
        "onset": (r.rand(batch, frames, 88) > 0.97).astype(np.float32),
        "offset": (r.rand(batch, frames, 88) > 0.97).astype(np.float32),
        "frame": (r.rand(batch, frames, 88) > 0.9).astype(np.float32),
        "velocity": r.rand(batch, frames, 88).astype(np.float32),
    }


def main(proc, nproc, port, out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nproc)

    from reconvat_tpu.parallel import distributed as dist
    from reconvat_tpu.parallel import mesh as pmesh

    if nproc > 1:
        dist.initialize(f"localhost:{port}", nproc, proc)
        mesh = pmesh.make_multihost_mesh(dp=2, sp=2)
    else:
        mesh = pmesh.make_mesh(8, sp=2)

    import jax.numpy as jnp
    import numpy as np

    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.train.state import create_train_state, make_train_step

    frames, batch = 64, 4
    model = ReconVAT(reconstruction=True)

    with pmesh.activate(mesh) as ctx:
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   seq_frames=frames)
        state = pmesh.replicate(state, ctx)

        bl, bu = global_batch(1, batch, frames), global_batch(2, batch,
                                                              frames)
        if nproc > 1:
            # each process contributes its local slice of the global batch
            lo, hi = proc * batch // nproc, (proc + 1) * batch // nproc
            bl = {k: v[lo:hi] for k, v in bl.items()}
            bu = {k: v[lo:hi] for k, v in bu.items()}
        batch_l = pmesh.shard_batch(bl, ctx)
        batch_ul = pmesh.shard_batch(bu, ctx)

        step = make_train_step(model, alpha=1.0, vat=True,
                               use_unlabeled=True)
        new_state, losses = step(state, batch_l, batch_ul,
                                 jax.random.PRNGKey(3))
        jax.block_until_ready(new_state.params)

        # params are fully replicated -> addressable on every process
        fingerprint = float(sum(
            jnp.sum(jnp.abs(leaf)).item()
            for leaf in jax.tree_util.tree_leaves(new_state.params)))

    result = {"losses": {k: float(v) for k, v in losses.items()},
              "fingerprint": fingerprint,
              "n_global_devices": jax.device_count()}
    if proc == 0:
        with open(out_path, "w") as f:
            json.dump(result, f)
    dist.sync("done")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
