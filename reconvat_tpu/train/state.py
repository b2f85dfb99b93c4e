"""Train state, optimizer, and the jitted train/eval steps.

Optimization mirrors the reference recipe (`train_UNet_Onset_VAT.py:113-124`,
`model/helper_functions.py:570-615`): Adam, StepLR(step_size=1000,
gamma=0.98) stepped per batch (= staircase exponential decay), LDS losses
scaled by alpha/2, gradient clipping.

Deliberate divergence, documented: the reference calls `clip_grad_norm_`
*after* `optimizer.step()` (`model/helper_functions.py:599-607`), which makes
clipping a no-op for the step just taken. We clip before the update (the
intended behavior); pass `clip_gradient_norm=0` for strict-parity no-op
clipping.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def make_optimizer(learning_rate: float = 1e-3, decay_steps: int = 1000,
                   decay_rate: float = 0.98,
                   clip_gradient_norm: float = 3.0):
    """Adam + per-step staircase decay (StepLR parity) + pre-update clip."""
    schedule = optax.exponential_decay(
        init_value=learning_rate, transition_steps=decay_steps,
        decay_rate=decay_rate, staircase=True)
    chain = []
    if clip_gradient_norm:
        chain.append(optax.clip_by_global_norm(clip_gradient_norm))
    chain.append(optax.adam(schedule))
    return optax.chain(*chain), schedule


def create_train_state(model, key, learning_rate=1e-3, decay_steps=1000,
                       decay_rate=0.98, clip_gradient_norm=3.0,
                       seq_frames=640):
    variables = model.init(key, seq_frames=seq_frames)
    tx, _ = make_optimizer(learning_rate, decay_steps, decay_rate,
                           clip_gradient_norm)
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats"),
                      opt_state=tx.init(params), tx=tx)


def total_loss_from_dict(losses: dict, alpha: float) -> jnp.ndarray:
    """Reference loss summation (`model/helper_functions.py:588-595`)."""
    total = jnp.zeros(())
    for key, val in losses.items():
        if key.startswith("loss/train_LDS"):
            total = total + alpha * val / 2.0
        else:
            total = total + val
    return total


def make_train_step(model, alpha: float, vat: bool, use_unlabeled: bool,
                    application: bool = False,
                    donate: bool = False) -> Callable:
    """Builds a jitted step: (state, batch_l, batch_ul, key) ->
    (state, losses). `application=True` uses run_on_batch_application
    (the unlabeled-consistency fine-tuning objective,
    reference `model/helper_functions.py:618-663`).

    donate=True donates the input TrainState's buffers (params + Adam
    moments update in place, saving an HBM copy per step). The caller must
    not reuse the old state after the call — the production loop and the
    benches qualify; parity tests that re-run a step from the same state
    do not."""
    run = (model.run_on_batch_application if application
           else model.run_on_batch)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch_l, batch_ul, key):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            _, losses, _, new_stats = run(
                variables, batch_l,
                batch_ul if use_unlabeled else None,
                key, vat=vat, train=True)
            return total_loss_from_dict(losses, alpha), (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        # the loop's per-step accounting scalar, computed inside the
        # compiled step (same fp32 op sequence the loop used to build
        # eagerly — bit-identical) so the host reads ONE scalar per step
        # instead of dispatching ~6 tiny device ops; stripped before
        # TensorBoard logging (loop.py) to keep the reference's scalar keys
        losses = {**losses, "loss/total": total_loss_from_dict(losses, 1.0)}
        return state, losses

    return step


def make_eval_step(model, vat: bool = False) -> Callable:
    @functools.partial(jax.jit, static_argnames=())
    def step(state: TrainState, batch, key):
        _, losses, _, _ = model.run_on_batch(
            state.variables, batch, None, key, vat=vat, train=False)
        return losses

    return step
