"""Pipelined (deferred-readback) train/eval loops.

The reference loop (`model/helper_functions.py:570-620`) reads every
step's loss back to the host immediately; our loops defer readback by
`pipeline` steps so device compute overlaps host batch assembly. These
tests pin the contract: results are bit-identical at any depth, steps
still run in order, and the NaN guard still fires (just `depth` steps
late).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconvat_tpu.train import profiler
from reconvat_tpu.train.loop import (_StepDrain, eval_model, train_model,
                                     train_VAT_model)


def _fake_batches():
    while True:
        yield {"audio": np.zeros((2, 16), np.float32), "path": "x.flac"}


def _counting_step():
    calls = []

    def step(state, batch_l, batch_ul, key):
        assert "path" not in batch_l, "device_batch must strip metadata"
        calls.append(int(state))
        new_state = state + 1
        return new_state, {"loss/train_frame": jnp.float32(new_state) * 0.5}

    return step, calls


@pytest.mark.parametrize("pipeline", [0, 1, 3, 100])
def test_train_vat_model_identical_at_any_depth(pipeline, capsys):
    step, calls = _counting_step()
    state, losses = train_VAT_model(
        None, jnp.int32(0), {False: step, True: step}, 7, ep=1,
        l_iter=_fake_batches(), ul_iter=_fake_batches(),
        key=jax.random.PRNGKey(0), vat=True, vat_start=0,
        verbose=True, pipeline=pipeline)
    assert calls == list(range(7))  # steps dispatched in order
    assert int(state) == 7
    assert float(losses["loss/train_frame"]) == pytest.approx(3.5)
    # epoch total printed after flush: mean of 0.5*(1..7) = 2.0
    out = capsys.readouterr().out
    assert "Loss: 2.000000" in out


@pytest.mark.parametrize("pipeline", [0, 2])
def test_train_model_full_epoch(pipeline):
    step, calls = _counting_step()
    loader = [{"audio": np.zeros((2, 16), np.float32)} for _ in range(5)]
    state, losses = train_model(None, jnp.int32(0), step, 1, loader,
                                jax.random.PRNGKey(0), verbose=False,
                                pipeline=pipeline)
    assert calls == list(range(5))
    assert int(state) == 5


@pytest.mark.parametrize("pipeline", [0, 2])
def test_eval_model_metrics_order(pipeline):
    def eval_step(state, batch, key):
        return {"loss/eval": jnp.float32(batch["audio"].sum())}

    loader = [{"audio": np.full((1,), i, np.float32)} for i in range(6)]
    metrics = eval_model(None, None, eval_step, 1, loader,
                         jax.random.PRNGKey(0), pipeline=pipeline)
    assert metrics["loss/eval"] == [float(i) for i in range(6)]


def test_nan_guard_fires_despite_lag(monkeypatch):
    monkeypatch.setenv("RECONVAT_NAN_CHECKS", "1")
    assert profiler.nan_checks_enabled()

    def step(state, batch_l, batch_ul, key):
        new_state = state + 1
        val = jnp.where(new_state == 3, jnp.nan, 1.0)
        return new_state, {"loss/train_frame": jnp.float32(val)}

    with pytest.raises(FloatingPointError):
        train_VAT_model(None, jnp.int32(0), {False: step, True: step}, 5,
                        ep=1, l_iter=_fake_batches(), ul_iter=None,
                        key=jax.random.PRNGKey(0), verbose=False,
                        pipeline=4)


def test_step_drain_depth_semantics():
    realized = []
    drain = _StepDrain(2, None, False,
                       on_step=lambda i, losses: realized.append(i))
    drain.push(0, {"loss/a": jnp.float32(1.0)})
    drain.push(1, {"loss/a": jnp.float32(2.0)})
    assert realized == []  # both still in flight at depth 2
    drain.push(2, {"loss/a": jnp.float32(3.0)})
    assert realized == [0]  # oldest realized once depth exceeded
    assert drain.flush() == pytest.approx(6.0)
    assert realized == [0, 1, 2]

def test_epoch_subkeys_bit_identical_to_iterated_splits():
    """The one-dispatch scan must reproduce the reference loop's iterated
    `key, sub = jax.random.split(key)` sequence exactly."""
    from reconvat_tpu.train.loop import _epoch_subkeys

    key = jax.random.PRNGKey(123)
    subs = _epoch_subkeys(key, 6)
    k = jax.random.PRNGKey(123)
    for i in range(6):
        k, sub = jax.random.split(k)
        assert np.array_equal(np.asarray(sub), np.asarray(subs[i])), i


def test_loop_strips_device_total_from_returned_losses():
    """make_train_step adds a device-computed 'loss/total' accounting
    scalar; the loops must strip it so TensorBoard logging keeps exactly
    the reference's scalar keys."""
    def step(state, batch_l, batch_ul, key):
        return state + 1, {"loss/train_frame": jnp.float32(1.0),
                           "loss/total": jnp.float32(1.0)}

    _, losses = train_VAT_model(None, jnp.int32(0), {False: step, True: step},
                                3, ep=1, l_iter=_fake_batches(), ul_iter=None,
                                key=jax.random.PRNGKey(0), verbose=False)
    assert "loss/total" not in losses and "loss/train_frame" in losses
    loader = [{"audio": np.zeros((1, 8), np.float32)} for _ in range(2)]
    _, losses = train_model(None, jnp.int32(0), step, 1, loader,
                            jax.random.PRNGKey(0), verbose=False)
    assert "loss/total" not in losses
