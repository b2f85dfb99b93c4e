"""Train the Prestack (U-Net + ResNet-18) baseline.

CLI-compatible port of reference `train_baseline_Prestack.py`. The
reference notes this model "always crashes, need to keep saving weights and
load it back" (`train_baseline_Prestack.py:114-117`) because it loops
per-frame patches in Python; here patches run as one batched device
computation, and orbax checkpoints + resume_iteration cover recovery.
"""
from datetime import datetime

from reconvat_tpu.config import Experiment, FileStorageObserver, print_config

ex = Experiment("train_original")

mode = "imagewise"
logging_freq = 100
saving_freq = 10


@ex.config
def config():
    root = "runs"
    device = "tpu"
    log = True
    w_size = 31
    spec = "Mel"
    resume_iteration = None
    train_on = "String"
    n_heads = 4
    iteration = 10
    VAT_start = 0
    alpha = 1
    VAT = False
    XI = 1e-6
    eps = 1.3
    small = True
    supersmall = False
    KL_Div = False
    reconstruction = False

    batch_size = 1
    train_batch_size = 1
    sequence_length = 327680

    epoches = 20000
    learning_rate = 1e-4
    learning_rate_decay_steps = 1000
    learning_rate_decay_rate = 0.98
    leave_one_out = None
    clip_gradient_norm = 3
    validation_length = sequence_length
    refresh = False
    seed = 42
    # reference protocol: full-epoch supervised sweeps, not the
    # 10-iteration VAT loop (`train_baseline_Thickstun.py:122`)
    train_loop = "full_epoch"
    compute_dtype = None   # 'bfloat16' = mixed-precision compute
    # device-mesh parallelism knobs (see reconvat_tpu/parallel/mesh.py;
    # mesh_dp=-1 = all devices, mesh_sp = sequence-parallel ways,
    # multihost = DCN axis via jax.distributed)
    mesh_dp = 0
    mesh_sp = 0
    multihost = False

    logdir = (f"{root}/baseline_Prestack-train_on={train_on}"
              f"-lr={learning_rate}-"
              + datetime.now().strftime("%y%m%d-%H%M%S"))

    ex.observers.append(FileStorageObserver.create(logdir))


@ex.automain
def train(spec, device, log, compute_dtype, **_ignored):
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    print_config(ex.current_run)

    from reconvat_tpu.models.prestack import Prestack
    from reconvat_tpu.train.driver import run_training

    model = Prestack(log=log, mode=mode, spec=spec,
                  compute_dtype=compute_dtype)
    return run_training(model, ex.current_run.config)
