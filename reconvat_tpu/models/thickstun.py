"""Thickstun translation-invariant baseline.

Port target: reference `Thickstun` (`model/Thickstun_model.py:9-73`), which
pads the spec 12 frames each side, unfolds every frame into a 229x25 patch
(a 25x memory blowup and a giant per-frame batch), then runs
freq-conv(128x(128,1)/stride(2,1)) -> time-conv(4096x(1,25)) -> linear.

TPU-first reformulation: because the freq conv has time-width 1 and the
time conv covers exactly the 25-frame window, the per-patch network is
mathematically a fully-convolutional net over the padded spectrogram —
so we run it that way: one conv over freq, one conv over time, one
per-frame dense. Identical outputs, O(T) memory instead of O(25T).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..nn.unet import torch_conv_init
from ..ops.normalize import Normalization
from ..ops.spectrogram import frontend_precision, make_frontend
from .losses import binary_cross_entropy

N_KEYS = C.N_KEYS


class ThickstunModule(nn.Module):
    k_out: int = 128
    k2_out: int = 4096
    freq_kernel: int = 128
    freq_stride: int = 2
    time_kernel: int = 25
    dtype: str | None = None   # computation dtype; params stay fp32

    def setup(self):
        self.CNN_freq = nn.Conv(self.k_out, (1, self.freq_kernel),
                                strides=(1, self.freq_stride),
                                padding="VALID",
                                kernel_init=torch_conv_init,
                                dtype=self.dtype)
        self.CNN_time = nn.Conv(self.k2_out, (self.time_kernel, 1),
                                strides=(1, 1), padding="VALID",
                                kernel_init=torch_conv_init,
                                dtype=self.dtype)
        # the (4096*51 -> 88) contraction carries most of the FLOPs, so it
        # joins the compute dtype (unlike the tiny fp32 heads elsewhere);
        # MXU accumulation is fp32 either way
        self.linear = nn.Dense(N_KEYS, use_bias=False,
                               kernel_init=torch_conv_init,
                               dtype=self.dtype)

    def __call__(self, spec, train: bool = False):
        """spec (B, T, F) -> frame posteriogram (B, T, 88)."""
        pad = self.time_kernel // 2
        x = jnp.pad(spec, ((0, 0), (pad, pad), (0, 0)))[..., None]
        z2 = nn.relu(self.CNN_freq(x))          # (B, T+24, 51, 128)
        z3 = nn.relu(self.CNN_time(z2))         # (B, T, 51, 4096)
        B, T, Fo, Co = z3.shape
        # torch flattens (N, C, F) channel-major (`Thickstun_model.py:34`)
        flat = jnp.transpose(z3, (0, 1, 3, 2)).reshape(B, T, Co * Fo)
        y = self.linear(nn.relu(flat))
        return nn.sigmoid(y.astype(jnp.float32))


@dataclasses.dataclass
class Thickstun:
    """Batch contract (reference `Thickstun.run_on_batch`,
    `model/Thickstun_model.py:37-73`): supervised only, no VAT; the loss key
    is 'loss/train_frame' in train AND eval, exactly like the reference."""
    log: bool = True
    mode: str = "imagewise"
    spec: str = "Mel"
    n_heads: int = 4
    reconstruction: bool = False
    compute_dtype: str | None = None  # 'bfloat16' = mixed-precision compute

    def __post_init__(self):
        self.frontend, self.n_bins = make_frontend(
            self.spec,
            precision=frontend_precision(self.compute_dtype))
        self.module = ThickstunModule(dtype=self.compute_dtype)
        self.normalize = Normalization(self.mode)

    def init(self, key, seq_frames: int = 640):
        dummy = jnp.zeros((1, seq_frames, self.n_bins))
        return self.module.init(key, dummy, train=False)

    def make_spec(self, audio, t_true=None):
        from ..parallel.mesh import spec_constraint

        from .common import make_log_norm_spec

        return spec_constraint(make_log_norm_spec(self, audio, t_true))

    def run_on_batch(self, variables, batch_l, batch_ul=None, key=None,
                     vat: bool = False, train: bool = True, t_true=None):
        from .common import frame_mask

        frame_label = batch_l["frame"]
        mask = (None if t_true is None
                else frame_mask(t_true, frame_label.shape[1]))
        spec = self.make_spec(batch_l["audio"], t_true)
        frame_pred = self.module.apply(variables, spec, train=train)
        predictions = {"onset": frame_pred, "frame": frame_pred,
                       "r_adv": None}
        losses = {"loss/train_frame":
                  binary_cross_entropy(frame_pred, frame_label, mask)}
        return predictions, losses, spec, None

    def transcribe(self, variables, audio, bucket_frames: int = 0):
        from .common import transcribe_spec

        spec, t_true = transcribe_spec(self, audio, bucket_frames)
        frame_pred = self.module.apply(variables, spec, train=False)
        if bucket_frames:
            frame_pred = frame_pred[:, :t_true]
        return {"onset": frame_pred, "frame": frame_pred}

    def load_reference_weights(self, path: str, variables):
        from ..train.torch_convert import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        params = jax.tree_util.tree_map(np.asarray,
                                        dict(variables["params"]))
        # torch conv layout (O, I, H=freq, W=time); our spatial order is
        # (time, freq) => permute (W, H, I, O)
        params["CNN_freq"]["kernel"] = np.transpose(
            sd["CNN_freq.weight"], (3, 2, 1, 0)).astype(np.float32)
        params["CNN_freq"]["bias"] = sd["CNN_freq.bias"].astype(np.float32)
        params["CNN_time"]["kernel"] = np.transpose(
            sd["CNN_time.weight"], (3, 2, 1, 0)).astype(np.float32)
        params["CNN_time"]["bias"] = sd["CNN_time.bias"].astype(np.float32)
        params["linear"]["kernel"] = sd["linear.weight"].T.astype(np.float32)
        return {"params": params}
