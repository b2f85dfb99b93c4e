"""End-to-end learned-transcription accuracy: a briefly-overfit model must
recover the time-frequency content of its training song through the full
audio -> spec -> model -> posteriogram pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reconvat_tpu.data.labels import label_to_masks, tsv_to_rolls
from reconvat_tpu.models.reconvat import ReconVAT
from reconvat_tpu.train.state import create_train_state, make_train_step

from . import synth_data


@pytest.mark.slow
def test_overfit_model_transcribes_training_song():
    rows = synth_data.synth_notes(21.0, seed=3, n_notes=24)
    audio_i16 = synth_data.render_audio(rows, 21.0)
    audio = audio_i16.astype(np.float32) / 32768.0
    label, _ = tsv_to_rolls(rows, len(audio_i16))
    onset_m, _, frame_m = label_to_masks(label)

    frames_crop = 64
    model = ReconVAT(reconstruction=False)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               learning_rate=1e-3, seq_frames=frames_crop)
    step = make_train_step(model, 1, vat=False, use_unlabeled=False)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    for _ in range(120):
        t0 = rng.randint(0, len(audio) - frames_crop * 512) // 512
        b = {"audio": jnp.asarray(
                 audio[t0 * 512:t0 * 512 + frames_crop * 512][None]),
             "frame": jnp.asarray(frame_m[t0:t0 + frames_crop][None]),
             "onset": jnp.asarray(onset_m[t0:t0 + frames_crop][None])}
        key, sub = jax.random.split(key)
        state, losses = step(state, b, b, sub)
    assert float(losses["loss/train_frame"]) < 0.05

    pred = model.transcribe(state.variables, jnp.asarray(audio[None]))
    roll = np.asarray(pred["frame"])[0] > 0.5
    ref = frame_m[:roll.shape[0]] > 0.5
    tp = (roll & ref).sum()
    fp = (roll & ~ref).sum()
    fn = (~roll & ref).sum()
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert f1 > 0.5, (precision, recall, f1)
