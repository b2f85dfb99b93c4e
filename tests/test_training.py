"""Training-engine tests: supersmall overfit (BASELINE config #2 analogue),
dataset mechanics, loader, optimizer schedule."""
import os

import numpy as np
import pytest

import jax

from reconvat_tpu.data.datasets import MAPS
from reconvat_tpu.data.loader import DataLoader, cycle
from reconvat_tpu.models.reconvat import ReconVAT
from reconvat_tpu.train import checkpoint as ckpt
from reconvat_tpu.train.state import (create_train_state, make_eval_step,
                                      make_train_step, make_optimizer)

from . import synth_data


@pytest.fixture(scope="module")
def maps_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("maps")
    return synth_data.make_maps_like(str(root),
                                     groups=("AkPnBcht", "ENSTDkAm"),
                                     files_per_group=2, duration_s=6.0)


def test_maps_dataset_mechanics(maps_root):
    seq = 64 * 512
    ds = MAPS(maps_root, groups=["AkPnBcht"], sequence_length=seq,
              overlap=False, supersmall=False, verbose=False)
    assert len(ds) == 2
    item = ds[0]
    assert item["audio"].shape == (seq,)
    assert item["frame"].shape == (64, 88)
    assert item["audio"].dtype == np.float32
    assert 0 <= item["audio"].max() <= 1.0
    assert set(np.unique(item["onset"])) <= {0.0, 1.0}
    # supersmall -> 1 file ([3] of the sorted 4-file list needs 4 files)
    ds_all = MAPS(maps_root, groups=["AkPnBcht", "ENSTDkAm"],
                  sequence_length=seq, overlap=False, supersmall=False,
                  verbose=False)
    assert len(ds_all) == 4

    # cache round trip
    ds2 = MAPS(maps_root, groups=["AkPnBcht"], sequence_length=seq,
               overlap=False, verbose=False)
    np.testing.assert_array_equal(ds.data[0]["label"], ds2.data[0]["label"])


def test_loader_batching(maps_root):
    ds = MAPS(maps_root, groups=["AkPnBcht"], sequence_length=32 * 512,
              overlap=False, verbose=False)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == len(loader) == 1
    assert batches[0]["audio"].shape == (2, 32 * 512)
    assert batches[0]["frame"].shape == (2, 32, 88)
    it = cycle(loader)
    for _ in range(3):
        b = next(it)
        assert b["audio"].shape[0] == 2


def test_lr_schedule_steplr_parity():
    _, schedule = make_optimizer(1e-3, decay_steps=1000, decay_rate=0.98)
    np.testing.assert_allclose(schedule(0), 1e-3)
    np.testing.assert_allclose(schedule(999), 1e-3)
    np.testing.assert_allclose(schedule(1000), 1e-3 * 0.98)
    np.testing.assert_allclose(schedule(2500), 1e-3 * 0.98 ** 2)


@pytest.mark.slow
def test_supersmall_overfit(maps_root):
    """Supervised overfit on one crop must drive frame BCE down hard
    (reference sanity protocol, SURVEY §4.1)."""
    seq = 64 * 512
    ds = MAPS(maps_root, groups=["AkPnBcht"], sequence_length=seq,
              overlap=False, verbose=False, seed=7)
    # freeze one crop: take a single item and reuse it
    item = ds[0]
    batch = {k: np.asarray(v)[None] for k, v in item.items()
             if k in ("audio", "onset", "offset", "frame", "velocity")}

    model = ReconVAT(reconstruction=False)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               learning_rate=5e-4, clip_gradient_norm=3,
                               seq_frames=64)
    step = make_train_step(model, alpha=1, vat=False, use_unlabeled=False)

    losses0 = None
    key = jax.random.PRNGKey(1)
    for i in range(60):
        key, sub = jax.random.split(key)
        state, losses = step(state, batch, batch, sub)
        if losses0 is None:
            losses0 = {k: float(v) for k, v in losses.items()}
    first = losses0["loss/train_frame"]
    last = float(losses["loss/train_frame"])
    assert last < first * 0.35, (first, last)
    assert last < 0.25, last

    # eval step runs and produces test_ keys
    eval_step = make_eval_step(model)
    eval_losses = eval_step(state, batch, jax.random.PRNGKey(2))
    assert "loss/test_frame" in eval_losses


def test_checkpoint_roundtrip(tmp_path):
    model = ReconVAT(reconstruction=False)
    state = create_train_state(model, jax.random.PRNGKey(0), seq_frames=32)
    path = ckpt.save_checkpoint(str(tmp_path), 5, state, block=True)
    assert ckpt.latest_checkpoint(str(tmp_path)) == os.path.join(
        str(tmp_path), "model-5")

    state2 = create_train_state(model, jax.random.PRNGKey(1), seq_frames=32)
    state2 = ckpt.restore_checkpoint(path, state2)
    l0 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l0, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_safe_after_buffer_mutation(tmp_path):
    """Async save must copy to host before returning: mutating (donating)
    the state buffers right after save() must not corrupt the write."""
    import jax

    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.train.state import create_train_state

    model = ReconVAT(reconstruction=False)
    state = create_train_state(model, jax.random.PRNGKey(0), seq_frames=32)
    leaf0 = np.array(jax.tree_util.tree_leaves(state.params)[0])
    path = ckpt.save_checkpoint(str(tmp_path), 7, state)   # non-blocking
    # simulate donation: overwrite every param leaf in place on host side
    state = state.replace(params=jax.tree_util.tree_map(
        lambda a: a * 0 - 1.0, state.params))
    ckpt.wait_for_checkpoints()
    state2 = create_train_state(model, jax.random.PRNGKey(1), seq_frames=32)
    state2 = ckpt.restore_checkpoint(path, state2)
    np.testing.assert_array_equal(
        np.array(jax.tree_util.tree_leaves(state2.params)[0]), leaf0)
