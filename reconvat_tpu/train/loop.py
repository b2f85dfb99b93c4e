"""Training loops + TensorBoard logging.

Mirrors reference `train_VAT_model` / `train_model` / `eval_model` /
`tensorboard_log` (`model/helper_functions.py:542-687`): per-"epoch"
`iteration` steps drawn from cycled labeled/unlabeled loaders, LDS losses
scaled by alpha/2, per-epoch scalar logging, periodic full evaluation.
"""
from __future__ import annotations

import functools
from collections import defaultdict, deque

import jax
import numpy as np

from ..data.loader import device_batch
from ..evaluate import evaluate_wo_velocity
from . import profiler


@functools.partial(jax.jit, static_argnames="n")
def _subkey_scan(key, n):
    """The loop's n iterated `key, sub = jax.random.split(key)` calls as
    ONE compiled scan — bit-identical subkey sequence, but a single device
    dispatch per epoch instead of one per step (each eager split is a tiny
    device op whose dispatch latency stalls the host's dispatch path)."""
    def body(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    _, subs = jax.lax.scan(body, key, None, length=n)
    return subs


def _epoch_subkeys(key, n):
    try:
        return np.asarray(_subkey_scan(key, n))
    except TypeError:  # pragma: no cover — typed PRNG keys can't cross
        subs = []                          # to numpy; stay eager
        for _ in range(n):
            key, sub = jax.random.split(key)
            subs.append(sub)
        return subs


def _host_total(host_losses):
    """total_loss_from_dict(…, 1.0) on already-fetched host scalars."""
    if "loss/total" in host_losses:
        return float(host_losses["loss/total"])
    total = 0.0
    for k, v in host_losses.items():
        total += float(v) / 2.0 if k.startswith("loss/train_LDS") \
            else float(v)
    return total


def strip_total(losses):
    """Drop the step's device-computed accounting scalar before logging so
    TensorBoard carries exactly the reference's scalar keys."""
    return {k: v for k, v in losses.items() if k != "loss/total"}


class _StepDrain:
    """Deferred host readback of per-step losses.

    JAX dispatch is asynchronous, but the reference-style loop reads every
    step's loss back to the host (`float(...)`) immediately after dispatch,
    which blocks until the step finishes — so host batch assembly and the
    H2D copy of the next batch never overlap device compute. Instead we
    queue each step's device-resident loss dict and only realize it after
    `depth` further steps have been dispatched: while the host blocks on
    step i's losses, step i+1 is already running and batch i+2 is being
    collated/transferred. Totals are bit-identical at any depth — only the
    moment of readback moves (the NaN guard and progress print trail by
    `depth` steps). depth=0 restores the fully synchronous loop.
    """

    def __init__(self, depth, timer, check_nans, on_step=None):
        self.depth = max(0, int(depth))
        self.timer = timer
        self.check_nans = check_nans
        self.on_step = on_step
        self.total_loss = 0.0
        self._pending = deque()

    def push(self, i, losses):
        self._pending.append((i, losses))
        while len(self._pending) > self.depth:
            self._drain_one()

    def flush(self):
        while self._pending:
            self._drain_one()
        return self.total_loss

    def _drain_one(self):
        i, losses = self._pending.popleft()
        # ONE gather to host; everything downstream (total, NaN guard,
        # progress print) is plain float arithmetic — the old path built
        # ~6 eager device ops per step (total_loss_from_dict) plus one
        # float() per printed loss, each a dispatch-latency stall
        host = jax.device_get(losses)
        self.total_loss += _host_total(host)
        if self.timer is not None:
            self.timer.tick()
        if self.check_nans:
            profiler.nan_guard(host, "loss")
        if self.on_step is not None:
            self.on_step(i, host)


def train_VAT_model(model, state, train_step, iteration, ep, l_iter, ul_iter,
                    key, vat=False, vat_start=0, verbose=True, timer=None,
                    pipeline=1):
    """One "epoch" = `iteration` optimizer steps. Returns (state, losses).

    `pipeline` steps stay in flight before loss readback (see `_StepDrain`);
    0 restores the reference's fully synchronous per-step accounting.
    """
    losses = {}
    check_nans = profiler.nan_checks_enabled()

    def show(i, step_losses):
        if verbose:
            main = sum(float(v) for k, v in step_losses.items()
                       if k != "loss/total")
            print(f"Train Epoch: {ep} [{i}/{iteration}] "
                  f"Main Loss: {main:.6f}", end="\r")

    drain = _StepDrain(pipeline, timer, check_nans, on_step=show)
    subs = _epoch_subkeys(key, iteration)
    for i in range(iteration):
        batch_l = device_batch(next(l_iter))
        use_vat = vat and ep >= vat_start
        batch_ul = device_batch(next(ul_iter)) \
            if (ul_iter is not None and use_vat) \
            else batch_l  # placeholder with matching shapes; unused
        state, losses = train_step[bool(use_vat)](state, batch_l, batch_ul,
                                                  subs[i])
        drain.push(i, losses)
    total_loss = drain.flush()
    if verbose:
        print(" " * 100, end="\r")
        msg = f"Train Epoch: {ep}\tLoss: {total_loss / iteration:.6f}"
        if timer is not None and timer.step_time:
            msg += f"\t({timer.summary()})"
        print(msg)
    return state, strip_total(losses)


def train_model(model, state, train_step, ep, loader, key, verbose=True,
                timer=None, pipeline=1):
    """Full-epoch supervised sweep over a loader (reference `train_model`,
    `model/helper_functions.py:542-568`). Returns (state, losses)."""
    losses = {}
    n = 0

    def show(i, step_losses):
        if verbose:
            print(f"Train Epoch: {ep} [{i + 1}]", end="\r")

    drain = _StepDrain(pipeline, timer, profiler.nan_checks_enabled(),
                       on_step=show)
    subs = None
    try:  # sized loader: pre-split every step's subkey in one dispatch
        subs = _epoch_subkeys(key, len(loader))
    except TypeError:
        pass
    for batch in loader:
        if subs is not None and n < len(subs):
            sub = subs[n]
        else:
            key, sub = jax.random.split(key)
        b = device_batch(batch)
        state, losses = train_step(state, b, b, sub)
        drain.push(n, losses)
        n += 1
    total_loss = drain.flush()
    if verbose:
        print(" " * 100, end="\r")
        print(f"Train Epoch: {ep}\tLoss: {total_loss / max(n, 1):.6f}")
    return state, strip_total(losses)


def eval_model(model, state, eval_step, ep, loader, key, verbose=False,
               pipeline=1):
    """Reference `eval_model` (`model/helper_functions.py:667-687`)."""
    metrics = defaultdict(list)
    pending = deque()
    depth = max(0, int(pipeline))

    def drain_one():
        i, losses = pending.popleft()
        for k, v in jax.device_get(losses).items():
            metrics[k].append(float(v))
        if verbose:
            print(f"Eval Epoch: {ep} [{i}]", end="\r")

    subs = None
    try:
        subs = _epoch_subkeys(key, len(loader))
    except TypeError:
        pass
    for i, batch in enumerate(loader):
        if subs is not None and i < len(subs):
            sub = subs[i]
        else:
            key, sub = jax.random.split(key)
        pending.append((i, eval_step(state, device_batch(batch), sub)))
        while len(pending) > depth:
            drain_one()
    while pending:
        drain_one()
    return metrics


def flatten_attention(a, w_size=31):
    """Unroll a banded attention map (L, window) to a dense (L, L) image
    for visualization (reference `flatten_attention`,
    `model/helper_functions.py:527-540`)."""
    a = np.asarray(a)
    hw = (w_size - 1) // 2
    L = a.shape[0]
    out = np.zeros((L, L), dtype=a.dtype)
    for t in range(L):
        start = 0 if t - hw < 0 else t - hw
        end = L if t + hw > L else t + hw
        if t < hw:
            out[t, start:end + 1] = a[t, -(end - start) - 1:]
        else:
            out[t, start:end] = a[t, :(end - start)]
    return out


class NullLogger:
    """Write-nothing logger for non-main processes in a multi-host run:
    they must execute the same device computations as host 0 (collective
    lockstep) but must not contend for the TensorBoard event files."""

    def add_scalar(self, key, value, step):
        pass

    def log_losses(self, losses, step):
        pass

    def log_images(self, tag, arrays, step, cmap="jet"):
        pass

    def close(self):
        pass


class TensorboardLogger:
    """Scalar + figure logging with the reference's tags."""

    def __init__(self, logdir):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(logdir)

    def add_scalar(self, key, value, step):
        self.writer.add_scalar(key, value, global_step=step)

    def log_losses(self, losses, step):
        for key, value in losses.items():
            self.writer.add_scalar(key, float(value), global_step=step)

    def log_images(self, tag, arrays, step, cmap="jet"):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(arrays)
        rows = 2 if n > 2 else 1
        cols = -(-n // rows)
        fig, axs = plt.subplots(rows, cols, figsize=(12 * cols, 4 * rows),
                                squeeze=False)
        for idx, arr in enumerate(arrays):
            ax = axs[idx // cols][idx % cols]
            ax.imshow(np.asarray(arr).T, origin="lower", cmap=cmap)
            ax.axis("off")
        fig.tight_layout()
        self.writer.add_figure(tag, fig, step)

    def close(self):
        self.writer.close()


def tensorboard_log(logger, model, state, batch_visualize, validation_set,
                    supervised_loader, eval_step, ep, logging_freq, key,
                    vat, vat_start, reconstruction, verbose=True):
    """Periodic logging mirroring reference `tensorboard_log`
    (`model/helper_functions.py:120-275`)."""
    key, sub = jax.random.split(key)
    use_vat = vat and ep >= vat_start
    preds, losses, mel, _ = model.run_on_batch(
        state.variables, batch_visualize, None, sub,
        vat=use_vat, train=False)

    if ep % logging_freq == 0 or ep == 1:
        def runner(batch):
            p, l, s, _ = model.run_on_batch(
                state.variables,
                {k: (np.asarray(v)[None] if k in ("audio", "onset", "offset",
                                                  "frame", "velocity")
                     and np.asarray(v).ndim in (1, 2) else v)
                 for k, v in batch.items()},
                None, jax.random.PRNGKey(0), vat=False, train=False)
            return p, l, s

        results = evaluate_wo_velocity(validation_set, runner,
                                       reconstruction=reconstruction)
        for k, values in results.items():
            if k.startswith("metric/"):
                _, category, name = k.split("/")
                if verbose:
                    print(f"{category:>32} {name:25}: "
                          f"{np.mean(values):.3f} ± {np.std(values):.3f}")
                if (("precision" in name or "recall" in name
                     or "f1" in name) and "chroma" not in name):
                    logger.add_scalar(k, float(np.mean(values)), ep)
        test_losses = eval_model(model, state, eval_step, ep,
                                 supervised_loader, key)
        for k, values in test_losses.items():
            if k.startswith("loss/"):
                logger.add_scalar(k, float(np.mean(values)), ep)

    if ep == 1:
        logger.log_images("images/Original", np.asarray(mel), ep)
        logger.log_images("images/Label",
                          np.asarray(batch_visualize["frame"]), ep,
                          cmap=None)

    if ep % logging_freq == 0:
        for out_key in ["frame", "onset", "frame2", "onset2"]:
            if preds.get(out_key) is not None:
                logger.log_images(f"images/{out_key}",
                                  np.asarray(preds[out_key]), ep, cmap=None)
        if preds.get("reconstruction") is not None:
            rec = np.asarray(preds["reconstruction"])[..., 0]
            logger.log_images("images/Reconstruction", rec, ep)
        if preds.get("r_adv") is not None:
            adv = np.asarray(mel) + np.asarray(preds["r_adv"])
            logger.log_images("images/Spec_adv", adv, ep)
        if preds.get("attention") is not None:
            attn = np.asarray(preds["attention"])  # (B, L, heads, window)
            w = attn.shape[-1]
            maps = [flatten_attention(attn[0, :, h], w)
                    for h in range(attn.shape[2])]
            logger.log_images("images/Attention", maps, ep)
    return losses
