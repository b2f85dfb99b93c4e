"""Per-family mesh exactness (round-4 VERDICT missing #2).

`tests/test_parallel.py` proves dp x sp sharding for ReconVAT only; a
framework claim needs every family to execute its production train step
under a mesh and reproduce the single-device math. BiLSTM families
(OnsetsAndFrames) run dp-only — the lax.scan recurrence makes
sequence-parallel time sharding a per-step collective chain (SURVEY
§2.5), so sp stays at 1 for them by configuration.
"""
import numpy as np
import pytest

import jax

from reconvat_tpu.parallel import mesh as pmesh
from reconvat_tpu.train.state import create_train_state, make_train_step


def _batch(batch, frames, seed):
    r = np.random.RandomState(seed)
    return {
        "audio": (r.randn(batch, frames * 512) * 0.1).astype(np.float32),
        "onset": (r.rand(batch, frames, 88) > 0.97).astype(np.float32),
        "offset": (r.rand(batch, frames, 88) > 0.97).astype(np.float32),
        "frame": (r.rand(batch, frames, 88) > 0.9).astype(np.float32),
        "velocity": r.rand(batch, frames, 88).astype(np.float32),
    }


def _make_unet_onset():
    from reconvat_tpu.models.unet_onset import UNetOnset

    return UNetOnset(reconstruction=True)


def _make_onsets_frames():
    from reconvat_tpu.models.onsets_frames import OnsetsAndFrames

    return OnsetsAndFrames(model_complexity=8)


def _make_segmentation():
    from reconvat_tpu.models.segmentation import SemanticSegmentation

    return SemanticSegmentation()


def _make_thickstun():
    from reconvat_tpu.models.thickstun import Thickstun

    return Thickstun()


def _make_prestack():
    from reconvat_tpu.models.prestack import Prestack

    return Prestack()


# (name, make, dp, sp, frames, batch, vat): sp=1 rows are the recurrence
# (BiLSTM) families and the patch-unfold model, dp-only by design
CASES = [
    ("UNetOnset", _make_unet_onset, 4, 2, 64, 4, True),
    ("OnsetsAndFrames", _make_onsets_frames, 8, 1, 64, 8, True),
    ("Segmentation", _make_segmentation, 4, 2, 64, 4, True),
    ("Thickstun", _make_thickstun, 4, 2, 64, 4, False),
    ("Prestack", _make_prestack, 4, 1, 8, 4, False),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,make,dp,sp,frames,batch,vat", CASES,
                         ids=[c[0] for c in CASES])
def test_family_sharded_step_matches_single_device(name, make, dp, sp,
                                                   frames, batch, vat):
    """One production train step, dp(+sp)-sharded vs single device —
    same criterion as tests/test_parallel.py for the flagship."""
    model = make()
    batch_l = _batch(batch, frames, seed=1)
    batch_ul = _batch(batch, frames, seed=2)
    key = jax.random.PRNGKey(3)

    def run(sharded):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   seq_frames=frames)
        step = make_train_step(model, alpha=1.0, vat=vat,
                               use_unlabeled=vat)
        if sharded:
            mesh = pmesh.make_mesh(dp * sp, dp=dp, sp=sp)
            with pmesh.activate(mesh) as ctx:
                state = pmesh.replicate(state, ctx)
                bl = pmesh.shard_batch(batch_l, ctx)
                bu = pmesh.shard_batch(batch_ul, ctx)
                new_state, losses = step(state, bl, bu, key)
                jax.block_until_ready(new_state.params)
        else:
            new_state, losses = step(state, batch_l, batch_ul, key)
        return ({k: float(v) for k, v in losses.items()},
                jax.tree_util.tree_leaves(new_state.params)[0])

    losses_1, leaf_1 = run(sharded=False)
    losses_n, leaf_n = run(sharded=True)
    # cross-shard reduction order shifts fp32 sums at the ~1e-3 level
    for k in losses_1:
        np.testing.assert_allclose(losses_n[k], losses_1[k], rtol=3e-3,
                                   atol=1e-4, err_msg=f"{name}:{k}")
    # Adam's first update is ~ +-lr * sign(grad); fp-noise-level gradient
    # elements can flip sign between reduction orders, so every delta is
    # bounded by 2*lr, the bulk of parameters agree to far better, and the
    # median is numerical-noise-level (same criterion as
    # tests/test_mesh_driver.py, measured there)
    lr = 1e-3
    a, b = np.asarray(leaf_n).ravel(), np.asarray(leaf_1).ravel()
    d = np.abs(a - b)
    assert d.max() <= 2.05 * lr, f"{name}: {d.max()}"
    assert np.median(d) < 1e-6, f"{name}: {np.median(d)}"
    assert np.mean(d < 1e-4) > 0.85, f"{name}: {np.mean(d < 1e-4)}"
