"""bf16 mixed precision for every model family.

Round 1 gave ReconVAT/UNet `compute_dtype='bfloat16'` (params/BN/heads/
losses fp32); round 2 extends it to OnsetsAndFrames, Segmentation,
Thickstun and Prestack (reference fp32-only equivalents:
`model/onset_frame_VAT.py:603-719`, `model/Segmentation.py:451-642`,
`model/Thickstun_model.py:9-73`, `model/Unet_prestack.py:113-176`).

Each family: (a) the bf16 forward must track the fp32 forward within a
documented tolerance on the posteriogram, (b) a train-mode gradient pass
must produce finite fp32 grads for fp32 params.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cases():
    from reconvat_tpu.models.onsets_frames import OnsetsAndFrames
    from reconvat_tpu.models.prestack import Prestack
    from reconvat_tpu.models.reconvat import ReconVAT
    from reconvat_tpu.models.segmentation import SemanticSegmentation
    from reconvat_tpu.models.thickstun import Thickstun
    from reconvat_tpu.models.unet_onset import UNetOnset

    # (name, factory(dtype), frames, max_abs_tol on posteriors)
    return [
        ("ReconVAT",
         lambda d: ReconVAT(reconstruction=True, compute_dtype=d), 64, 2e-2),
        ("UNetOnset",
         lambda d: UNetOnset(reconstruction=True, compute_dtype=d), 64, 2e-2),
        ("OnsetsAndFrames",
         lambda d: OnsetsAndFrames(model_complexity=8, compute_dtype=d),
         64, 2e-2),
        ("Segmentation",
         lambda d: SemanticSegmentation(compute_dtype=d), 64, 3e-2),
        ("Thickstun", lambda d: Thickstun(compute_dtype=d), 32, 2e-2),
        ("Prestack", lambda d: Prestack(compute_dtype=d), 8, 3e-2),
    ]


def _batch(frames, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "audio": (rng.randn(2, frames * 512) * 0.1).astype(np.float32),
        "onset": (rng.rand(2, frames, 88) > 0.97).astype(np.float32),
        "offset": (rng.rand(2, frames, 88) > 0.97).astype(np.float32),
        "frame": (rng.rand(2, frames, 88) > 0.9).astype(np.float32),
        "velocity": rng.rand(2, frames, 88).astype(np.float32),
    }


@pytest.mark.parametrize("name,make,frames,tol", _cases(),
                         ids=[c[0] for c in _cases()])
@pytest.mark.slow
def test_bf16_forward_tracks_fp32(name, make, frames, tol):
    fp32 = make(None)
    bf16 = make("bfloat16")
    variables = fp32.init(jax.random.PRNGKey(0), seq_frames=frames)
    batch = _batch(frames)

    p32, l32, _, _ = fp32.run_on_batch(variables, batch, None,
                                       jax.random.PRNGKey(0), vat=False,
                                       train=False)
    p16, l16, _, _ = bf16.run_on_batch(variables, batch, None,
                                       jax.random.PRNGKey(0), vat=False,
                                       train=False)
    f32 = np.asarray(p32["frame"], np.float32)
    f16 = np.asarray(p16["frame"], np.float32)
    assert f16.dtype == np.float32  # posteriors come back fp32
    assert np.max(np.abs(f16 - f32)) < tol, np.max(np.abs(f16 - f32))
    assert np.mean(np.abs(f16 - f32)) < tol / 4
    for k in l32:
        assert np.isfinite(float(l16[k])), k


@pytest.mark.parametrize("name,make,frames,tol", _cases(),
                         ids=[c[0] for c in _cases()])
@pytest.mark.slow
def test_bf16_grads_finite_and_fp32(name, make, frames, tol):
    bf16 = make("bfloat16")
    variables = bf16.init(jax.random.PRNGKey(0), seq_frames=frames)
    batch = _batch(frames, seed=1)

    def loss_fn(params):
        vs = {**variables, "params": params}
        _, losses, _, _ = bf16.run_on_batch(vs, batch, None,
                                            jax.random.PRNGKey(2), vat=False,
                                            train=True)
        return sum(v for k, v in losses.items() if k.startswith("loss/"))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    for g in leaves:
        assert g.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(g)))
