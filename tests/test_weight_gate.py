"""Weight-conversion F1 dry-run gate (VERDICT #9).

Simulates the released-weights parity check end to end without the released
weights: a reference torch `UNet` is built, its state_dict saved to a .pt
file, converted with the production converter
(`ReconVAT.load_reference_weights` -> `train/torch_convert.py`), and then
BOTH full evaluation pipelines — reference torch eager `run_on_batch` +
decode vs our jitted pipeline — run over the same synthetic songs through
`evaluate_wo_velocity`. The entire result_dict must agree. When real
released weights arrive, the same code path is the F1 gate
(`tools/convert_weights.py` + root `evaluate.py`).

Reference pipeline bits exercised: `model/self_attention_VAT.py:1090-1203`
(run_on_batch), `evaluate.py:82-90` (eval protocol).
"""
import os

import numpy as np
import pytest

import jax

from reconvat_tpu.evaluate import evaluate_wo_velocity
from reconvat_tpu.models.reconvat import ReconVAT

from . import reference_oracle


def _songs(n=2, frames=96):
    rng = np.random.RandomState(42)
    for i in range(n):
        t = np.arange(frames * 512) / 16000.0
        tone = sum(0.2 * np.sin(2 * np.pi * f * t)
                   for f in (220.0, 440.0, 523.25))
        audio = (tone + 0.05 * rng.randn(len(t))).astype(np.float32)
        yield {
            "path": f"gate_song{i}.flac",
            "audio": audio,
            "frame": (rng.rand(frames, 88) > 0.9).astype(np.float32),
            "onset": (rng.rand(frames, 88) > 0.97).astype(np.float32),
        }


@pytest.mark.slow
def test_converted_weights_reproduce_reference_result_dict(tmp_path):
    torch = pytest.importorskip("torch")
    sav = reference_oracle.reference_module("self_attention_VAT")
    torch.manual_seed(0)
    ref = sav.UNet((2, 2), (2, 2), log=True, reconstruction=True,
                   mode="imagewise", spec="Mel").eval()
    # random-init posteriors hover at 0.5 where any fp wiggle flips the
    # decode threshold; bias the shared head so the roll is decisively
    # sparse on both sides (the released weights are, too)
    with torch.no_grad():
        ref.transcriber.linear1.bias -= 3.0
    pt_path = str(tmp_path / "weight.pt")
    torch.save(ref.state_dict(), pt_path)

    model = ReconVAT(reconstruction=True)
    variables = model.init(jax.random.PRNGKey(0), seq_frames=96)
    converted = model.load_reference_weights(pt_path, variables)

    songs = list(_songs())

    def ref_runner(item):
        batch = {k: torch.tensor(np.asarray(v)[None])
                 for k, v in item.items() if k != "path"}
        with torch.no_grad():
            p, l, s = ref.run_on_batch(batch, None, VAT=False)
        p = {k: (v.numpy() if hasattr(v, "numpy") else v)
             for k, v in p.items()}
        l = {k: float(v) for k, v in l.items()}
        return p, l, s.numpy()

    def our_runner(item):
        batch = {k: np.asarray(v)[None] for k, v in item.items()
                 if k != "path"}
        p, l, s, _ = model.run_on_batch(converted, batch, None,
                                        jax.random.PRNGKey(0), vat=False,
                                        train=False)
        return p, l, s

    res_ref = evaluate_wo_velocity(songs, ref_runner, reconstruction=True,
                                   save_path=str(tmp_path / "ref"))
    res_our = evaluate_wo_velocity(songs, our_runner, reconstruction=True,
                                   save_path=str(tmp_path / "our"))

    assert set(res_ref) == set(res_our)
    for key in res_ref:
        ref_v = np.asarray(res_ref[key], float)
        our_v = np.asarray(res_our[key], float)
        if key.startswith("metric/MusicNet/"):
            # average precision ranks the *raw* posteriors — the one
            # continuous metric, so torch-vs-XLA fp wiggle shows up
            np.testing.assert_allclose(our_v, ref_v, atol=1e-4, err_msg=key)
        elif key.startswith("metric/"):
            # decode + matching are discrete: after the sparsity bias the
            # pipelines must agree exactly per song
            np.testing.assert_allclose(our_v, ref_v, atol=1e-9, err_msg=key)
        else:
            np.testing.assert_allclose(our_v, ref_v, rtol=1e-3, atol=2e-4,
                                       err_msg=key)

    # the exported artifacts must match too (same notes -> same MIDI bytes)
    import os

    for fname in os.listdir(tmp_path / "ref"):
        if fname.endswith(".pred.mid"):
            a = (tmp_path / "ref" / fname).read_bytes()
            b = (tmp_path / "our" / fname).read_bytes()
            assert a == b, fname


@pytest.mark.slow
def test_evaluate_cli_ingests_real_torch_pt(tmp_path, monkeypatch):
    """The root `evaluate.py` CLI end-to-end on a real-architecture torch
    .pt (round-4 VERDICT weak #7): a live reference `UNet` state_dict is
    saved, the CLI is invoked in-process (`ex.run`, the same path
    `python evaluate.py with ...` takes), and the full pipeline — MAPS
    test-split dataset, conversion, bucketed jitted eval, metric printout,
    result_dict pickle, MIDI/PNG artifacts — must produce finite metrics
    and the expected artifacts. This is exactly the released-weights F1
    gate command with synthetic weights + corpus."""
    import importlib.util

    torch = pytest.importorskip("torch")
    from . import synth_data

    sav = reference_oracle.reference_module("self_attention_VAT")
    torch.manual_seed(1)
    ref = sav.UNet((2, 2), (2, 2), log=True, reconstruction=True,
                   mode="imagewise", spec="Mel").eval()
    with torch.no_grad():
        ref.transcriber.linear1.bias -= 3.0
    torch.save(ref.state_dict(), str(tmp_path / "weight.pt"))

    maps_root = synth_data.make_maps_like(
        str(tmp_path / "maps"), groups=("ENSTDkAm", "ENSTDkCl"),
        files_per_group=1, duration_s=4.0)
    monkeypatch.setenv("RECONVAT_MAPS_ROOT", maps_root)
    # logdir = join(output_folder, weight_file) — run from tmp_path so the
    # relative weight_file keeps artifacts under tmp_path/results
    monkeypatch.chdir(tmp_path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "evaluate_cli", os.path.join(repo, "evaluate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    result = mod.ex.run(mod.ex._main_fn, overrides={
        "weight_file": "weight.pt", "model_type": "ReconVAT",
        "reconstruction": True, "device": "cpu", "host_workers": 2,
    })

    assert result, "CLI returned no metrics"
    for k, v in result.items():
        assert np.isfinite(v), (k, v)
    assert "metric/note/f1" in result
    logdir = tmp_path / "results" / "weight.pt"
    assert (logdir / "result_dict_infer").exists()
    midi_dir = logdir / "MIDI_results-infer"
    files = os.listdir(midi_dir)
    assert sum(f.endswith(".pred.mid") for f in files) == 2
