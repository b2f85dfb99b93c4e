"""Train UNet_Onset (the full semi-supervised ReconVAT main path).

CLI-compatible port of reference `train_UNet_Onset_VAT.py`:
    python train_UNet_Onset_VAT.py with train_on=MAPS small=True VAT=True \
        reconstruction=True
"""
from datetime import datetime

from reconvat_tpu.config import Experiment, FileStorageObserver, print_config

ex = Experiment("train_original")

ds_ksize, ds_stride = (2, 2), (2, 2)
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
    spec = "Mel"
    resume_iteration = None
    train_on = "MAPS"
    n_heads = 4
    position = True
    iteration = 10
    VAT_start = 0
    alpha = 1
    VAT = True
    XI = 1e-6
    eps = 2
    small = False
    supersmall = False
    KL_Div = False
    reconstruction = False

    batch_size = 8
    train_batch_size = 8
    sequence_length = 327680

    epoches = 20000
    learning_rate = 1e-3
    learning_rate_decay_steps = 1000
    learning_rate_decay_rate = 0.98
    leave_one_out = None
    clip_gradient_norm = 3
    validation_length = sequence_length
    refresh = False
    seed = 42
    compute_dtype = 'bfloat16'  # fp32 params/BN/heads; None = full fp32
    attn_impl = 'auto'  # 'auto'|'xla'|'pallas' (see nn/attention.py)
    conv_layout = 'auto'  # 'auto'|'folded'|'nhwc' U-Net layout (nn/unet.py)
    # device-mesh parallelism (reference is single-device by omission,
    # `train_UNet_Onset_VAT.py:34`): mesh_dp = data-parallel ways (-1 =
    # all devices), mesh_sp = sequence-parallel ways, multihost = add the
    # DCN axis via jax.distributed (see reconvat_tpu/parallel/mesh.py)
    mesh_dp = 0
    mesh_sp = 0
    multihost = False
    # 'batched' fuses the labeled+unlabeled VAT chains into one frozen-BN
    # 2B invocation — measured 1.11x step win on v5e
    # (bench_logs/r5_vat_chain_ab.log); default keeps the reference's two
    # train-mode-BN chains (see models/reconvat.ReconVAT.vat_chain)
    vat_chain = 'separate'
    eval_host_workers = 4  # thread pool over songs' host metrics
                           # (bit-identical; measured 1.9x, 0 = sync)

    logdir = (f"{root}/Unet_Onset-recons={reconstruction}-XI={XI}-eps={eps}"
              f"-alpha={alpha}-train_on=small_{small}_{train_on}"
              f"-w_size={w_size}-n_heads={n_heads}-lr={learning_rate}-"
              + datetime.now().strftime("%y%m%d-%H%M%S"))

    ex.observers.append(FileStorageObserver.create(logdir))


@ex.automain
def train(spec, device, log, reconstruction, XI, eps, KL_Div,
          compute_dtype, attn_impl, conv_layout, vat_chain, **_ignored):
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    print_config(ex.current_run)

    from reconvat_tpu.models.unet_onset import UNetOnset
    from reconvat_tpu.train.driver import run_training

    model = UNetOnset(log=log, reconstruction=reconstruction, mode=mode,
                      spec=spec, xi=XI, eps=eps, kl_div=KL_Div,
                      compute_dtype=compute_dtype, attn_impl=attn_impl,
                      conv_layout=conv_layout, vat_chain=vat_chain)
    return run_training(model, ex.current_run.config)
