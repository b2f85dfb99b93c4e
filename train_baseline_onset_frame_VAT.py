"""Train the Onsets-and-Frames CNN-BiLSTM baseline (optionally with VAT).

CLI-compatible port of reference `train_baseline_onset_frame_VAT.py`:
    python train_baseline_onset_frame_VAT.py with train_on=MAPS VAT=True
model_name selects onset_frame / frame / onset (the reference's
'attention' branch references an undefined class and is not supported).
"""
from datetime import datetime

from reconvat_tpu.config import Experiment, FileStorageObserver, print_config

ex = Experiment("train_original")

mode = "imagewise"
logging_freq = 100
saving_freq = 200


@ex.config
def config():
    root = "runs"
    onset_stack = True
    device = "tpu"
    log = True
    w_size = 31
    model_complexity = 48
    spec = "Mel"
    resume_iteration = None
    train_on = "String"
    iteration = 10
    alpha = 1
    VAT = False
    XI = 1e-6
    eps = 1e-1
    VAT_mode = "all"
    model_name = "onset_frame"
    VAT_start = 0
    small = True
    supersmall = False
    n_heads = 4
    reconstruction = False

    batch_size = 8
    train_batch_size = 8
    sequence_length = 327680

    epoches = 20000
    learning_rate = 5e-4
    learning_rate_decay_steps = 10000
    learning_rate_decay_rate = 0.98
    leave_one_out = None
    clip_gradient_norm = 3
    validation_length = sequence_length
    refresh = False
    seed = 42
    compute_dtype = None   # 'bfloat16' = mixed-precision conv trunk
    # device-mesh parallelism knobs (see reconvat_tpu/parallel/mesh.py;
    # mesh_dp=-1 = all devices, mesh_sp = sequence-parallel ways,
    # multihost = DCN axis via jax.distributed)
    mesh_dp = 0
    mesh_sp = 0
    multihost = False

    logdir = (f"{root}/baseline_Onset_Frame-"
              + datetime.now().strftime("%y%m%d-%H%M%S"))

    ex.observers.append(FileStorageObserver.create(logdir))


@ex.automain
def train(spec, device, log, model_name, model_complexity, XI, eps,
          VAT_mode, compute_dtype, **_ignored):
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    print_config(ex.current_run)

    from reconvat_tpu.models.onsets_frames import (FrameStackVAT,
                                                   OnsetsAndFrames,
                                                   OnsetStackVAT)
    from reconvat_tpu.train.driver import run_training

    kwargs = dict(model_complexity=model_complexity, log=log, mode=mode,
                  spec=spec, xi=XI, eps=eps, compute_dtype=compute_dtype)
    if model_name == "onset_frame":
        model = OnsetsAndFrames(**kwargs)
    elif model_name == "frame":
        model = FrameStackVAT(vat_mode=VAT_mode, **kwargs)
    elif model_name == "onset":
        model = OnsetStackVAT(vat_mode=VAT_mode, **kwargs)
    else:
        raise ValueError(f"unsupported model_name {model_name!r} "
                         f"(the reference's 'attention' branch references "
                         f"an undefined class)")
    return run_training(model, ex.current_run.config)
