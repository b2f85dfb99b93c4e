"""Conv trunk and recurrent stacks for the Onsets-and-Frames family.

Ports of reference `ConvStack` / `Onset_Stack` / `Combine_Stack`
(`model/onset_frame_VAT.py:321-414`). The BiLSTM runs as `lax.scan` via
flax nn.RNN — the reference's cuDNN eval-mode workaround (flipping the
module to train() to run the LSTM, `model/onset_frame_VAT.py:370-381`) is
deliberately NOT replicated; scan has no such issue.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .unet import torch_conv_init


class ConvStack(nn.Module):
    """O&F conv trunk: 3 convs + 2 (1,2) freq max-pools + dropout -> FC."""
    input_features: int
    output_features: int
    dtype: str | None = None   # computation dtype; params/BN stay fp32

    def setup(self):
        of = self.output_features
        p = [(1, 1), (1, 1)]
        self.conv0 = nn.Conv(of // 16, (3, 3), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn0 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv1 = nn.Conv(of // 16, (3, 3), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv2 = nn.Conv(of // 8, (3, 3), padding=p,
                             kernel_init=torch_conv_init, dtype=self.dtype)
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.fc = nn.Dense(of, kernel_init=torch_conv_init,
                           dtype=self.dtype)
        self.drop1 = nn.Dropout(0.25)
        self.drop2 = nn.Dropout(0.25)
        self.drop_fc = nn.Dropout(0.5)

    def __call__(self, spec, train: bool = False):
        """spec (B, T, F) -> (B, T, output_features)."""
        x = spec[..., None]  # NHWC, freq as W
        x = nn.relu(self.bn0(self.conv0(x), use_running_average=not train))
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = self.drop1(x, deterministic=not train)
        x = nn.relu(self.bn2(self.conv2(x), use_running_average=not train))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = self.drop2(x, deterministic=not train)
        # (B, T, F/4, C) -> channel-major flatten like torch's
        # transpose(1, 2).flatten(-2) on NCHW
        B, T, F, C = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, C * F)
        x = self.fc(x)
        x = self.drop_fc(x, deterministic=not train)
        return x


class BiLSTM(nn.Module):
    """Bidirectional LSTM, output width = 2 * hidden_size."""
    hidden_size: int

    def setup(self):
        self.fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name="fwd")
        self.bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                          reverse=True, keep_order=True, name="bwd")

    def __call__(self, x):
        return jnp.concatenate([self.fwd(x), self.bwd(x)], axis=-1)


class OnsetStack(nn.Module):
    """Reference `Onset_Stack` (`model/onset_frame_VAT.py:357-387`).

    dtype applies to the conv trunk only: the BiLSTM recurrence and the
    output head stay fp32 (the scan is latency-bound, not FLOP-bound, and
    bf16 error would compound over 640 steps).
    """
    input_features: int
    model_size: int
    output_features: int
    use_lstm: bool = True
    dtype: str | None = None

    def setup(self):
        self.convstack = ConvStack(self.input_features, self.model_size,
                                   dtype=self.dtype)
        if self.use_lstm:
            self.sequence_model = BiLSTM(self.model_size // 2)
        self.linear = nn.Dense(self.output_features,
                               kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        x = self.convstack(x, train)
        if self.use_lstm:
            x = self.sequence_model(x)
        x = self.linear(x)
        return nn.sigmoid(x)


class CombineStack(nn.Module):
    """Reference `Combine_Stack` (`model/onset_frame_VAT.py:390-414`)."""
    model_size: int
    output_features: int
    use_lstm: bool = True

    def setup(self):
        if self.use_lstm:
            self.sequence_model = BiLSTM(self.model_size // 2)
        self.linear = nn.Dense(self.output_features,
                               kernel_init=torch_conv_init)

    def __call__(self, x, train: bool = False):
        if self.use_lstm:
            x = self.sequence_model(x)
        x = self.linear(x)
        return nn.sigmoid(x)


# ---------------------------------------------------------------------------
# torch LSTM weight conversion
# ---------------------------------------------------------------------------

def lstm_torch_entries(prefix_torch, prefix_flax, state_dict):
    """Yield (flax_path, value) pairs converting a torch bidirectional LSTM
    (`weight_ih_l0[_reverse]` etc., gate order i,f,g,o) to our BiLSTM."""
    out = {}
    for direction, sub in [("", "fwd"), ("_reverse", "bwd")]:
        w_ih = state_dict.get(f"{prefix_torch}.weight_ih_l0{direction}")
        w_hh = state_dict.get(f"{prefix_torch}.weight_hh_l0{direction}")
        b_ih = state_dict.get(f"{prefix_torch}.bias_ih_l0{direction}")
        b_hh = state_dict.get(f"{prefix_torch}.bias_hh_l0{direction}")
        if w_ih is None:
            continue
        w_ih, w_hh = np.asarray(w_ih), np.asarray(w_hh)
        h = w_hh.shape[1]
        gates = ["i", "f", "g", "o"]
        for gi, g in enumerate(gates):
            sl = slice(gi * h, (gi + 1) * h)
            out[f"{prefix_flax}/{sub}/cell/i{g}/kernel"] = w_ih[sl].T
            out[f"{prefix_flax}/{sub}/cell/h{g}/kernel"] = w_hh[sl].T
            if b_ih is not None:
                out[f"{prefix_flax}/{sub}/cell/h{g}/bias"] = (
                    np.asarray(b_ih)[sl] + np.asarray(b_hh)[sl])
    return out
