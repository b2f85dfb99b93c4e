"""Evaluate a trained model on the MAPS test split (full songs) + export
MIDI/PNG artifacts.

CLI-compatible port of reference `evaluate.py` (whose own model-name
parsing only matched legacy classes absent from the repo — SURVEY §2.2).
Here `model_type` picks any model in the zoo and `weight_file` may be an
orbax checkpoint directory or a torch `.pt` state_dict.

    python evaluate.py with model_type=ReconVAT weight_file=runs/.../model-200
"""
import os
import pickle

import numpy as np

from reconvat_tpu.config import Experiment, print_config

ex = Experiment("evaluate")
log = True

MODEL_TYPES = ("ReconVAT", "UNet_Onset", "OnsetsAndFrames", "Thickstun",
               "Segmentation", "Prestack")


def build_model(model_type, spec, mode, reconstruction):
    if model_type == "ReconVAT":
        from reconvat_tpu.models.reconvat import ReconVAT

        return ReconVAT(log=log, reconstruction=reconstruction, mode=mode,
                        spec=spec)
    if model_type == "UNet_Onset":
        from reconvat_tpu.models.unet_onset import UNetOnset

        return UNetOnset(log=log, reconstruction=reconstruction, mode=mode,
                         spec=spec)
    if model_type == "OnsetsAndFrames":
        from reconvat_tpu.models.onsets_frames import OnsetsAndFrames

        return OnsetsAndFrames(log=log, mode=mode, spec=spec)
    if model_type == "Thickstun":
        from reconvat_tpu.models.thickstun import Thickstun

        return Thickstun(log=log, mode=mode, spec=spec)
    if model_type == "Segmentation":
        from reconvat_tpu.models.segmentation import SemanticSegmentation

        return SemanticSegmentation(log=log, mode=mode, spec=spec)
    if model_type == "Prestack":
        from reconvat_tpu.models.prestack import Prestack

        return Prestack(log=log, mode=mode, spec=spec)
    raise ValueError(f"model_type must be one of {MODEL_TYPES}")


def load_weights(model, variables, weight_file):
    if weight_file is None:
        print("WARNING: no weight_file given — evaluating random weights")
        return variables
    if weight_file.endswith(".pt"):
        return model.load_reference_weights(weight_file, variables)
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(weight_file))
    out = {"params": restored["params"]}
    if "batch_stats" in restored:
        out["batch_stats"] = restored["batch_stats"]
    return out


@ex.config
def config():
    spec = "Mel"
    mode = "imagewise"
    model_type = "ReconVAT"
    reconstruction = False
    weight_file = None
    output_folder = "results"
    inference = True
    onset = True
    device = "tpu"
    refresh = False
    rule = "rule2"
    batch_songs = 1  # >1: vmapped same-bucket song groups (faster, exact)
    host_workers = 4  # thread pool over songs' host scoring (bit-identical;
                      # measured 228.6 -> 122.5 ms/song at 4,
                      # bench_logs/r5_eval_workers.log); 0 = synchronous

    logdir = os.path.join(output_folder, str(weight_file))


@ex.automain
def train(spec, model_type, reconstruction, weight_file, mode, inference,
          onset, device, refresh, rule, batch_songs, host_workers, logdir,
          **_ignored):
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    print_config(ex.current_run)

    from reconvat_tpu.data.datasets import MAPS
    from reconvat_tpu.evaluate import (evaluate_wo_velocity,
                                       make_bucketed_runner)
    from reconvat_tpu.train.prepare import _roots

    inference_state = "infer" if inference else "no_infer"

    validation_dataset = MAPS(_roots()["MAPS"],
                              groups=["ENSTDkAm", "ENSTDkCl"],
                              sequence_length=None, refresh=refresh)

    model = build_model(model_type, spec, mode, reconstruction)
    variables = model.init(jax.random.PRNGKey(0))
    variables = load_weights(model, variables, weight_file)

    # jitted bucketed full-song evaluation: <= ~7 compiled shapes for the
    # whole corpus instead of one eager trace per song length
    runner = make_bucketed_runner(model, variables)

    metrics = evaluate_wo_velocity(
        validation_dataset, runner, reconstruction=reconstruction,
        onset=inference, rule=rule, batch_songs=batch_songs,
        host_workers=host_workers,
        save_path=os.path.join(logdir, f"MIDI_results-{inference_state}"))

    for key, values in metrics.items():
        if key.startswith("metric/"):
            _, category, name = key.split("/")
            print(f"{category:>32} {name:25}: "
                  f"{np.mean(values) * 100:.3f} ± {np.std(values) * 100:.3f}")
    os.makedirs(logdir, exist_ok=True)
    export_path = os.path.join(logdir, f"result_dict_{inference_state}")
    pickle.dump(dict(metrics), open(export_path, "wb"))
    return {k: float(np.mean(v)) for k, v in metrics.items()
            if k.startswith("metric/")}
