"""Shared training driver for the VAT training entry points.

This is the body of reference `train_UNet_VAT.py` / `train_UNet_Onset_VAT.py`
(`train_UNet_Onset_VAT.py:82-170`) factored into one function: prepare
datasets -> loaders -> train state -> epoch loop (train_VAT_model +
tensorboard_log + periodic checkpoints) -> final full-song evaluation.
"""
from __future__ import annotations

import os
import pickle

import jax

from ..data.loader import DataLoader, cycle, prefetch_to_device
from ..evaluate import (evaluate_wo_velocity, make_bucketed_runner,
                        print_metrics)
from ..utils import summary
from . import checkpoint as ckpt
from .loop import (NullLogger, TensorboardLogger, tensorboard_log,
                   train_VAT_model, train_model)
from .prepare import prepare_VAT_dataset
from .state import (create_train_state, make_eval_step, make_train_step)


def _eval_runner(model, state):
    """Jitted bucketed full-song runner (falls back to eager exact shapes
    for models without t_true support — see evaluate.make_bucketed_runner)."""
    return make_bucketed_runner(model, state.variables)


def build_mesh(cfg):
    """Device mesh from the training config, or None (single device —
    the reference's only mode, `train_UNet_Onset_VAT.py:34`).

    Knobs (every training CLI exposes them):
      mesh_dp:   data-parallel ways (batch axis; gradient psum over ICI).
                 -1 = all devices not taken by sp.
      mesh_sp:   sequence-parallel ways (posteriogram time axis; GSPMD
                 inserts the conv / window-attention halo exchanges).
      multihost: add the 'dcn' axis (one slice per process) on top of the
                 per-host dp x sp plane; requires jax.distributed
                 (parallel/distributed.py). Only the gradient all-reduce
                 crosses DCN.
    """
    dp = int(cfg.get("mesh_dp") or 0)
    sp = int(cfg.get("mesh_sp") or 0)
    multihost = bool(cfg.get("multihost", False))
    if not (multihost or dp > 1 or sp > 1 or dp == -1):
        return None
    from ..parallel import mesh as pmesh

    sp = max(sp, 1)
    if multihost:
        from ..parallel import distributed

        distributed.initialize()
        return pmesh.make_multihost_mesh(dp=(dp if dp > 0 else None), sp=sp)
    if dp <= 0:
        dp = len(jax.devices()) // sp
    return pmesh.make_mesh(dp * sp, dp=dp, sp=sp)


def run_training(model, cfg, datasets=None):
    """cfg: resolved config dict (sacred-style names). datasets: optional
    prebuilt (l_set, ul_set, validation, full_validation) tuple.

    With mesh_dp/mesh_sp/multihost set, the entire run — state, steps,
    checkpoints, TensorBoard eval, final full-song evaluation — executes
    under an activated `parallel.mesh` device mesh: parameters replicated,
    batches sharded batch-over-(dcn,)dp and time-over-sp, XLA GSPMD
    inserting the collectives (SURVEY §2.5; the reference is single-device
    by omission)."""
    mesh = build_mesh(cfg)
    if mesh is None:
        return _run_training(model, cfg, datasets, None)
    from ..parallel import mesh as pmesh

    with pmesh.activate(mesh) as ctx:
        return _run_training(model, cfg, datasets, ctx)


def _run_training(model, cfg, datasets, mesh_ctx):
    if datasets is None:
        datasets = prepare_VAT_dataset(
            sequence_length=cfg["sequence_length"],
            validation_length=cfg["sequence_length"],
            refresh=cfg.get("refresh", False),
            small=cfg.get("small", False),
            supersmall=cfg.get("supersmall", False),
            dataset=cfg["train_on"])
    supervised_set, unsupervised_set, validation_dataset, full_validation = \
        datasets

    # host 0 owns every artifact write (checkpoints, TensorBoard, MIDI
    # dumps); all processes still execute the same device computations so
    # multi-host collectives stay in lockstep
    is_main = jax.process_index() == 0
    shard = None
    if mesh_ctx is not None:
        from ..data.loader import BATCH_KEYS, MappedLoader
        from ..parallel import mesh as pmesh

        n_proc = jax.process_count() if mesh_ctx.multihost else 1
        bs = cfg.get("train_batch_size", cfg["batch_size"])
        if (bs * n_proc) % mesh_ctx.batch_shards:
            raise ValueError(
                f"global batch ({bs} x {n_proc} process(es)) must divide "
                f"over {mesh_ctx.batch_shards} batch shards (dcn x dp) — "
                "adjust batch_size or mesh_dp")
        if (cfg["sequence_length"] // 512) % mesh_ctx.time_shards:
            raise ValueError(
                f"{cfg['sequence_length'] // 512} frames must divide over "
                f"mesh_sp={mesh_ctx.time_shards}")

        def shard(batch):
            arrs = pmesh.shard_batch(
                {k: v for k, v in batch.items() if k in BATCH_KEYS},
                mesh_ctx)
            return {**batch, **arrs}

    vat = cfg.get("VAT", False)
    alpha = cfg.get("alpha", 1)
    seed = cfg.get("seed", 42)
    logdir = cfg["logdir"]

    ul_loader = None
    if vat and len(unsupervised_set):
        ul_loader = DataLoader(unsupervised_set, cfg["batch_size"],
                               shuffle=True, drop_last=True, seed=seed + 1)
    supervised_loader = DataLoader(supervised_set,
                                   cfg.get("train_batch_size",
                                           cfg["batch_size"]),
                                   shuffle=True, drop_last=True, seed=seed)
    # reference uses a flat val batch of 4 (`helper_functions.py:117`), but
    # caps it by the model's own batch_size: Prestack's per-frame unfold
    # OOMs a single chip at 4 x 640 frames (its authors note it "always
    # crashes", reference `train_baseline_Prestack.py:114` — ours
    # shouldn't)
    val_batch_size = (min(4, cfg.get("batch_size", 4),
                          len(validation_dataset)) or 1)
    valloader = DataLoader(validation_dataset, val_batch_size,
                           shuffle=False, drop_last=True, seed=seed)
    batch_visualize = next(iter(valloader))

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    seq_frames = cfg["sequence_length"] // 512
    state = create_train_state(
        model, init_key, learning_rate=cfg["learning_rate"],
        decay_steps=cfg.get("learning_rate_decay_steps", 1000),
        decay_rate=cfg.get("learning_rate_decay_rate", 0.98),
        clip_gradient_norm=cfg.get("clip_gradient_norm", 3),
        seq_frames=seq_frames)

    resume = cfg.get("resume_iteration")
    if resume == "latest":
        # auto-resume from the newest checkpoint in the run directory
        path = ckpt.latest_checkpoint(cfg.get("trained_dir", logdir))
        if path is not None:
            state = ckpt.restore_checkpoint(path, state)
            print(f"auto-resumed from {path}")
    elif resume is not None:
        path = os.path.join(cfg.get("trained_dir", "trained_MAPS"),
                            f"model-{resume}")
        state = ckpt.restore_checkpoint(path, state)
        print(f"resumed from {path}")

    if mesh_ctx is not None:
        # params + optimizer moments replicated over every mesh device;
        # from here on the sharded batches drive GSPMD's collectives
        state = pmesh.replicate(state, mesh_ctx)

    summary(type(model).__name__, {"params": state.params})

    application = cfg.get("application", False)
    donate = cfg.get("donate", True)
    train_steps = {
        False: make_train_step(model, alpha, vat=False, use_unlabeled=False,
                               application=application, donate=donate),
        True: make_train_step(model, alpha, vat=True,
                              use_unlabeled=ul_loader is not None,
                              application=application, donate=donate),
    }
    eval_step = make_eval_step(model)

    logger = None
    # background batch assembly (DataLoader prefetch thread) + H2D double
    # buffering so host work overlaps device steps; under a mesh the same
    # prefetch path places each batch sharded (batch over (dcn,)dp, label
    # time over sp)
    l_iter = prefetch_to_device(cycle(supervised_loader), put=shard)
    ul_iter = (prefetch_to_device(cycle(ul_loader), put=shard)
               if ul_loader is not None else None)

    epoches = cfg.get("epoches", 20000)
    iteration = cfg.get("iteration", 10)
    logging_freq = cfg.get("logging_freq", 100)
    saving_freq = cfg.get("saving_freq", 200)
    vat_start = cfg.get("VAT_start", 0)
    # steps in flight before loss readback (loop._StepDrain); 0 = the
    # reference's fully synchronous per-step accounting
    pipeline = cfg.get("pipeline", 1)

    from .profiler import StepTimer

    timer = StepTimer(audio_seconds_per_step=(
        cfg.get("train_batch_size", cfg["batch_size"])
        * cfg["sequence_length"] / 16000))

    # supervised baselines sweep the whole loader each epoch (reference
    # `train_baseline_Thickstun.py:122`, `train_baseline_Prestack.py:129`);
    # VAT configs keep the 10-iteration loop
    full_epoch = cfg.get("train_loop", "iteration") == "full_epoch"
    epoch_loader = (MappedLoader(supervised_loader, shard)
                    if shard is not None else supervised_loader)

    for ep in range(1, epoches + 1):
        key, sub = jax.random.split(key)
        if full_epoch:
            state, losses = train_model(model, state, train_steps[False],
                                        ep, epoch_loader, sub,
                                        timer=timer, pipeline=pipeline)
        else:
            state, losses = train_VAT_model(
                model, state, train_steps, iteration, ep, l_iter, ul_iter,
                sub, vat=vat, vat_start=vat_start, timer=timer,
                pipeline=pipeline)
        if cfg.get("profile_epoch") == ep:
            from . import profiler as _prof

            with _prof.trace(os.path.join(logdir, "profile")):
                key, sub = jax.random.split(key)
                state, _ = train_VAT_model(
                    model, state, train_steps, 1, ep, l_iter, ul_iter, sub,
                    vat=vat, vat_start=vat_start, verbose=False)

        if logger is None:
            # non-main processes run the same eval forwards (collective
            # lockstep) but write nothing
            logger = (TensorboardLogger(logdir) if is_main
                      else NullLogger())
        key, sub = jax.random.split(key)
        tensorboard_log(logger, model, state, batch_visualize,
                        validation_dataset, supervised_loader, eval_step,
                        ep, logging_freq, sub, vat, vat_start,
                        cfg.get("reconstruction", False))

        if ep % saving_freq == 0:
            ckpt.save_checkpoint(logdir, ep, state)
        logger.log_losses(losses, ep)

    print("Training finished, now evaluating on the test split (full songs)")
    metrics = evaluate_wo_velocity(
        full_validation, _eval_runner(model, state),
        reconstruction=False,
        batch_songs=cfg.get("eval_batch_songs", 1),
        host_workers=cfg.get("eval_host_workers", 4),
        save_path=(os.path.join(logdir, "MIDI_results") if is_main
                   else None))
    print_metrics(metrics)
    if is_main:
        with open(os.path.join(logdir, "result_dict"), "wb") as f:
            pickle.dump(dict(metrics), f)
    if logger is not None:
        logger.close()
    return state, metrics
