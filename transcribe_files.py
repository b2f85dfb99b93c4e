"""Transcribe audio files in Application/Input to MIDI in Application/Output.

CLI-compatible port of reference `transcribe_files.py`:
    python transcribe_files.py with model_type=ReconVAT device=cpu
"""
import os

import numpy as np

from reconvat_tpu import constants as C
from reconvat_tpu import decode
from reconvat_tpu.config import Experiment
from reconvat_tpu.data.datasets import ApplicationDataset
from reconvat_tpu.data.midi_io import midi_to_hz, save_midi

ex = Experiment("transcription")

log = True
mode = "imagewise"
spec = "Mel"
root = "Application"
input_path = os.path.join(root, "Input")
output_path = os.path.join(root, "Output")


def transcribe2midi(data, model, variables, model_type, onset_threshold=0.5,
                    frame_threshold=0.5, save_path=None, rule="rule2",
                    bucket_frames=0, streaming=False,
                    streaming_windows=1, streaming_depth=3):
    """Reference `transcribe2midi` (`transcribe_files.py:12-40`)."""
    import inspect

    import jax.numpy as jnp

    os.makedirs(save_path, exist_ok=True)
    written = []
    supports_bucket = "bucket_frames" in inspect.signature(
        model.transcribe).parameters
    streamer = getattr(model, "transcribe_streaming", None)
    for item in data:
        audio = jnp.asarray(item["audio"])[None, :]
        if streaming and streamer is not None:
            # bounded-memory haloed windows for hour-scale recordings;
            # streaming_windows>1 batches that many same-shape windows
            # per forward (fewer device round trips)
            pred = streamer(variables, audio,
                            windows_per_batch=streaming_windows,
                            pipeline_depth=streaming_depth)
        elif bucket_frames and supports_bucket:
            pred = model.transcribe(variables, audio,
                                    bucket_frames=bucket_frames)
        else:
            pred = model.transcribe(variables, audio)
        onsets = np.maximum(np.asarray(pred["onset"])[0], 0)
        frames = np.maximum(np.asarray(pred["frame"])[0], 0)

        p_est, i_est = decode.extract_notes_wo_velocity(
            onsets, frames, onset_threshold, frame_threshold, rule=rule)

        scaling = C.HOP_LENGTH / C.SAMPLE_RATE
        i_est = (np.asarray(i_est) * scaling).reshape(-1, 2)
        p_est = np.array([midi_to_hz(C.MIN_MIDI + m) for m in p_est])

        name = os.path.basename(item["path"])[:-4]
        midi_path = os.path.join(save_path, f"{model_type}-{name}mid")
        print(f"midi_path = {midi_path}")
        save_midi(midi_path, p_est, i_est, [127] * len(p_est))
        written.append(midi_path)
    return written


@ex.config
def config():
    device = "tpu"
    model_type = "ReconVAT"
    weight_path = None  # torch .pt or orbax checkpoint dir; None = default
    # pad songs to this frame multiple so arbitrary lengths share a few
    # compiled shapes (0 = exact per-song shapes, reference-identical)
    bucket_frames = 512
    # streaming=True: bounded-memory haloed-window transcription for
    # hour-scale inputs (models/common.transcribe_streaming);
    # streaming_windows = windows stacked per forward when streaming
    streaming = False
    streaming_windows = 1
    # window forwards kept in flight with async D2H while streaming
    streaming_depth = 3
    # reference hardcodes Application/{Input,Output}
    # (`transcribe_files.py:47-48`); same defaults, overridable here
    input_path = os.path.join("Application", "Input")
    output_path = os.path.join("Application", "Output")


@ex.automain
def main(device, model_type, weight_path, bucket_frames, streaming,
         streaming_windows, streaming_depth, input_path, output_path):
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    application_dataset = ApplicationDataset(input_path)

    if model_type == "ReconVAT":
        from reconvat_tpu.models.reconvat import ReconVAT

        model = ReconVAT(log=log, reconstruction=True, mode=mode, spec=spec)
        default_weight = ("Weight/String_MusicNet/"
                          "Unet_R_VAT-XI=1e-06-eps=1.3-String_MusicNet-"
                          "lr=0.001/weight.pt")
    elif model_type == "baseline_Multi_Inst":
        from reconvat_tpu.models.segmentation import SemanticSegmentation

        model = SemanticSegmentation()
        default_weight = "Weight/String_MusicNet/baseline_Multi_Inst/weight.pt"
    else:
        raise ValueError(f"unknown model_type {model_type}")

    variables = model.init(jax.random.PRNGKey(42))
    wpath = weight_path or default_weight
    if wpath and os.path.exists(wpath):
        print("Loading model weight")
        if wpath.endswith(".pt"):
            variables = model.load_reference_weights(wpath, variables)
        else:
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(wpath))
            variables = {"params": restored["params"]}
            if "batch_stats" in restored:
                variables["batch_stats"] = restored["batch_stats"]
        print("Loading done")
    else:
        print(f"WARNING: weight file {wpath!r} not found — "
              f"running with random weights (smoke mode)")

    print("Transcribing Music")
    transcribe2midi(application_dataset, model, variables, model_type,
                    save_path=output_path, bucket_frames=bucket_frames,
                    streaming=streaming, streaming_windows=streaming_windows,
                    streaming_depth=streaming_depth)
